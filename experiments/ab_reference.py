"""End-to-end A/B against the ACTUAL reference implementation.

The strongest offline quality-parity evidence possible without pretrained
checkpoints: run the reference's own torch code (`/root/reference/`,
imported at runtime — never copied) and this framework on the SAME
synthetic dataset with the SAME frozen encoder weights, and compare

  1. clip embeddings (load → segment → wav2vec2 → layer-select mean →
     TPP → segment mean) — elementwise;
  2. retrieval neighbors (DB build → overfetch-(k+10) → basename
     exclusion → top-5) — path-for-path;
  3. trained detection quality (pos-weighted BCE, 3×Adam + clip(1.0),
     per-epoch val EER/AUC) — final/best metrics side by side.

(1) and (2) are exactness checks: they pin the full frozen embedding +
retrieval data path end to end through BOTH codebases. (3) is a
statistical check: init/dropout/shuffle RNGs differ between torch and
JAX, so trajectories are compared as metrics, not bits.

The reference runs unmodified on CPU; its missing native deps are shimmed
with exact stand-ins installed in sys.modules BEFORE any reference import
(config.py imports faiss/librosa/torchaudio at module scope):

  * faiss   → numpy flat L2/IP index (squared-L2, ascending, stable ties)
              with add/search/reconstruct/ntotal/write_index/read_index —
              the subset the reference touches (vector_database.py:56-242);
  * librosa → librosa.load via radad_tpu.data.audio (same WAV decode; the
              synthetic corpus is 16 kHz so no resampling is in play);
  * torchaudio → import-only stub (dataset.py:7 imports it, never uses it
              beyond main.py's env-var backend disabling).

transformers.{Wav2Vec2Model,Wav2Vec2Processor}.from_pretrained are
monkeypatched to return one shared seeded tiny-config model (no network)
and a Wav2Vec2FeatureExtractor(do_normalize=False) — base-960h's real
preprocessor setting. The SAME state_dict is converted for the JAX side
(models/hf_convert.py), so both frameworks run identical frozen weights.

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/ab_reference.py \
      --data_path /tmp/synth400 --epochs 10

Appends one JSON record to experiments/ab_reference.json.
"""

import argparse
import json
import os
import pickle
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)

import numpy as np

TINY_KW = dict(hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
               intermediate_size=128, conv_dim=(32, 32, 32, 32),
               conv_kernel=(10, 8, 4, 4), conv_stride=(5, 4, 4, 4),
               num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
               conv_bias=False)
# WavLM adds the gated relative position bias (tiny bucket table so the
# 4-layer model still exercises both bucket regimes at T≈99)
TINY_WAVLM_EXTRA = dict(num_buckets=32, max_bucket_distance=50)
# --size base: the REAL architectures the reference names in its config
# (config.py:42-45): HF {Wav2Vec2,WavLM}Config defaults ARE
# wav2vec2-base-960h / wavlm-base (768-d, 12 layers, 7-conv frontend);
# whisper-base is spelled out below (d_model 512, 6 encoder layers).
TINY_WHISPER_KW = dict(d_model=64, encoder_layers=2, decoder_layers=2,
                       encoder_attention_heads=4, decoder_attention_heads=4,
                       encoder_ffn_dim=128, decoder_ffn_dim=128,
                       num_mel_bins=80)
BASE_WHISPER_KW = dict(d_model=512, encoder_layers=6, decoder_layers=6,
                       encoder_attention_heads=8, decoder_attention_heads=8,
                       encoder_ffn_dim=2048, decoder_ffn_dim=2048,
                       num_mel_bins=80)


# --------------------------------------------------------------------------
# Shims (exact stand-ins for the reference's missing native deps)
# --------------------------------------------------------------------------

class _FlatIndex:
    """numpy IndexFlat{L2,IP}: the faiss API surface the reference uses."""

    def __init__(self, d, metric="L2"):
        self.d = int(d)
        self.metric = metric
        self.xb = np.zeros((0, self.d), np.float32)

    @property
    def ntotal(self):
        return self.xb.shape[0]

    def add(self, x):
        self.xb = np.concatenate(
            [self.xb, np.ascontiguousarray(x, np.float32)], axis=0)

    def search(self, q, k):
        q = np.ascontiguousarray(q, np.float32)
        if self.metric == "L2":  # squared L2, ascending (faiss convention)
            d = ((q ** 2).sum(1, keepdims=True) - 2.0 * (q @ self.xb.T)
                 + (self.xb ** 2).sum(1)[None, :])
        else:  # IP: descending similarity → sort on negated
            d = -(q @ self.xb.T)
        order = np.argsort(d, axis=1, kind="stable")[:, :k]
        dist = np.take_along_axis(d, order, axis=1)
        if self.metric != "L2":
            dist = -dist
        return dist.astype(np.float32), order.astype(np.int64)

    def reconstruct(self, i):
        return self.xb[int(i)].copy()


class _IVFFlat(_FlatIndex):
    """Exact-scan stand-in for IndexIVFFlat (unused by the default L2
    config; present so create_index's IVF branch doesn't crash)."""

    def __init__(self, quantizer, d, nlist, metric):
        super().__init__(d, "L2")
        self.nlist = nlist
        self.is_trained = False
        self.nprobe = 1

    def train(self, x):
        self.is_trained = True


def _register(mod):
    # a real ModuleSpec so importlib.util.find_spec (which transformers
    # runs on "faiss") accepts the shim
    import importlib.machinery
    mod.__spec__ = importlib.machinery.ModuleSpec(mod.__name__, None)
    sys.modules[mod.__name__] = mod


def install_shims():
    faiss = types.ModuleType("faiss")
    faiss.METRIC_L2 = 1
    faiss.IndexFlatL2 = lambda d: _FlatIndex(d, "L2")
    faiss.IndexFlatIP = lambda d: _FlatIndex(d, "IP")
    faiss.IndexIVFFlat = _IVFFlat

    def write_index(index, path):
        with open(path, "wb") as f:
            pickle.dump(index, f)

    def read_index(path):
        with open(path, "rb") as f:
            return pickle.load(f)

    def index_gpu_to_cpu(index):  # reference calls it inside try/except
        raise RuntimeError("CPU index")

    faiss.write_index = write_index
    faiss.read_index = read_index
    faiss.index_gpu_to_cpu = index_gpu_to_cpu
    faiss.get_num_gpus = lambda: 0
    _register(faiss)

    librosa = types.ModuleType("librosa")

    def load(path, sr=22050, duration=None, mono=True, **kw):
        from radad_tpu.data.audio import load_audio
        return load_audio(path, sample_rate=sr, duration=duration,
                          pad=False), sr

    librosa.load = load
    librosa.get_duration = lambda **kw: 0.0
    _register(librosa)

    ta = types.ModuleType("torchaudio")
    ta.set_audio_backend = lambda *a, **k: None
    _register(ta)


def patch_transformers(encoder="wav2vec2", size="tiny",
                       whisper_chunk_s=30, whisper_init_scale=1.0):
    """from_pretrained → one shared seeded model; returns it so the
    JAX side converts the identical state_dict.

    ``size="base"`` builds the REAL architecture the reference loads
    (feature_extractor.py:19,76,119: wav2vec2-base-960h / wavlm-base /
    whisper-base geometry) at the same seeded random init.
    ``whisper_chunk_s`` shrinks the whisper frontend's pad-to length
    (chunk_length) below the production 30 s; with random weights and 2 s
    segments the 28 s of shared zero-padding makes every TPP vector
    near-identical (the round-3 near-tie diagnostic), so the retrieval
    probe runs with a 4 s chunk where real frames dominate — the SAME
    reference code path, just a less degenerate operating point."""
    import torch
    import transformers
    from transformers import (Wav2Vec2Config, Wav2Vec2FeatureExtractor,
                              Wav2Vec2Model, Wav2Vec2Processor)

    torch.manual_seed(0)
    fe = Wav2Vec2FeatureExtractor(feature_size=1, sampling_rate=16000,
                                  do_normalize=False, padding_value=0.0,
                                  return_attention_mask=False)
    if encoder == "wav2vec2":
        kw = dict(feat_extract_norm="group", do_stable_layer_norm=False,
                  attn_implementation="eager")
        if size == "tiny":
            kw.update(TINY_KW)
        # base: Wav2Vec2Config() defaults == facebook/wav2vec2-base-960h
        model = Wav2Vec2Model(Wav2Vec2Config(**kw)).eval()
        Wav2Vec2Model.from_pretrained = staticmethod(lambda *a, **k: model)
        Wav2Vec2Processor.from_pretrained = staticmethod(
            lambda *a, **k: fe)
    elif encoder == "wavlm":
        from transformers import WavLMConfig, WavLMModel

        kw = dict(feat_extract_norm="group", do_stable_layer_norm=False)
        if size == "tiny":
            kw.update(TINY_KW)
            kw.update(TINY_WAVLM_EXTRA)
        # base: WavLMConfig() defaults == microsoft/wavlm-base
        model = WavLMModel(WavLMConfig(**kw)).eval()
        WavLMModel.from_pretrained = staticmethod(lambda *a, **k: model)
        # reference uses AutoFeatureExtractor for WavLM
        # (feature_extractor.py:131); wavlm-base's real processor is a
        # Wav2Vec2FeatureExtractor with do_normalize=False
        transformers.AutoFeatureExtractor.from_pretrained = staticmethod(
            lambda *a, **k: fe)
    elif encoder == "whisper":
        from transformers import (WhisperConfig, WhisperModel)
        from transformers import (WhisperFeatureExtractor
                                  as HFWhisperFeatureExtractor)

        kw = TINY_WHISPER_KW if size == "tiny" else BASE_WHISPER_KW
        # mel frames = 100/s; encoder conv2 stride 2 → positions = 50/s
        msp = int(whisper_chunk_s) * 50
        model = WhisperModel(WhisperConfig(
            max_source_positions=msp, **kw)).eval()
        if whisper_init_scale != 1.0:
            # Variance-scaled random weights (VERDICT r3 #3): the default
            # HF init keeps a random whisper's clip embeddings so close
            # together that neighbor order is tie lottery at the
            # cross-framework f32 noise floor. Amplifying the matmul
            # weights (never the LayerNorms) makes blocks chaotic enough
            # that clips separate; BOTH sides get the same scaled
            # state_dict, so this changes the operating point, not the
            # parity contract.
            with torch.no_grad():
                for name, p in model.encoder.named_parameters():
                    if p.ndim >= 2 and "layer_norm" not in name:
                        p.mul_(whisper_init_scale)
        WhisperModel.from_pretrained = staticmethod(lambda *a, **k: model)
        # the real HF frontend (mel filters computed locally, no network):
        # log-mel + (x - max + 8)/4 scaling + chunk-length pad, exactly
        # what the reference's from_pretrained would fetch
        # (feature_extractor.py:70)
        wfe = HFWhisperFeatureExtractor(feature_size=80,
                                        sampling_rate=16000,
                                        chunk_length=int(whisper_chunk_s))
        HFWhisperFeatureExtractor.from_pretrained = staticmethod(
            lambda *a, **k: wfe)
    else:
        raise ValueError(encoder)
    return model


# --------------------------------------------------------------------------


def run_reference(data_path, out_root, epochs, batch_size,
                  encoder="wav2vec2", torch_seed=None):
    sys.path.insert(0, REFERENCE)
    import torch
    from config import Config as RefConfig
    from dataset import AudioDataset
    from pipeline import DeepfakeDetectionPipeline

    if torch_seed is not None:
        # multi-seed training A/B: the ENCODER weights stay the shared
        # seed-0 draw (patch_transformers built the model already); this
        # re-seed varies only what differs run-to-run in the reference —
        # RADADModel init, dropout, DataLoader shuffle (pipeline.py:73-109,
        # 776-780). The split stays pinned by config.random_seed=42
        # (dataset.py:81-86).
        torch.manual_seed(torch_seed)
    cfg = RefConfig()
    cfg.device = torch.device("cpu")
    cfg.data_root = out_root
    cfg.train_data_path = data_path
    cfg.test_data_path = data_path
    cfg.vector_db_path = os.path.join(out_root, "vector_db")
    cfg.num_epochs = epochs
    cfg.num_workers = 0
    cfg.train_batch_size = batch_size
    cfg.eval_batch_size = batch_size
    cfg.db_batch_size = 64
    cfg.top_k = 5
    cfg.use_batch_norm = False  # main.py:65-66 forces layer_norm
    cfg.use_layer_norm = True
    cfg.feature_extractor_type = encoder

    pipe = DeepfakeDetectionPipeline(cfg)
    train_ds = AudioDataset(cfg, is_train=True, split_data=True)
    val_ds = AudioDataset(cfg, is_train=False, split_data=True)
    return pipe, train_ds, val_ds


def run_ours(data_path, out_root, epochs, batch_size, torch_model,
             encoder="wav2vec2", size="tiny", whisper_chunk_s=30,
             our_seed=None):
    from radad_tpu.config import Config
    from radad_tpu.data.manifest import load_manifests
    from radad_tpu.models.encoder import FrozenEncoder
    from radad_tpu.models.hf_convert import (convert_wav2vec2,
                                             convert_wavlm)
    from radad_tpu.models.wav2vec2 import Wav2Vec2Config
    from radad_tpu.models.wavlm import WavLMConfig
    from radad_tpu.train.pipeline import DetectionPipeline

    cfg = Config().replace(
        train_data_path=data_path, test_data_path=data_path,
        data_root=out_root, vector_db_path=os.path.join(out_root, "vdb"),
        num_epochs=epochs, batch_size=batch_size,
        eval_batch_size=batch_size, db_batch_size=64,
        # the reference DEFINES early_stopping_patience=5 but never reads
        # it (config.py:71); we honor it in DetectionPipeline — disable it
        # here so both sides train the same number of epochs
        early_stopping_patience=max(epochs, 1000),
        use_batch_norm=False, use_layer_norm=True,
        whisper_pad_seconds=float(whisper_chunk_s),
        feature_extractor_type=encoder)
    split_seed = cfg.random_seed  # reference pins 42 (dataset.py:81-86)
    if our_seed is not None:
        # multi-seed training A/B: varies fusion-model init, dropout and
        # shuffle (pipeline._rng / per-epoch shuffle seed); the SPLIT stays
        # on the reference-parity seed so both frameworks always train on
        # identical membership.
        cfg = cfg.replace(random_seed=our_seed)
    if encoder == "wav2vec2":
        # size="base": our dataclass defaults == wav2vec2-base-960h
        arch = (Wav2Vec2Config(**TINY_KW) if size == "tiny"
                else Wav2Vec2Config())
        params = convert_wav2vec2(torch_model.state_dict(), arch)
    elif encoder == "wavlm":  # last_hidden_state only (:160-168)
        arch = (WavLMConfig(**TINY_KW, **TINY_WAVLM_EXTRA)
                if size == "tiny" else WavLMConfig())
        params = convert_wavlm(torch_model.state_dict(), arch)
    else:  # whisper: encoder-only, chunk-length-pad parity mode (:94-113)
        from radad_tpu.models.hf_convert import convert_whisper_encoder
        from radad_tpu.models.whisper import WhisperConfig as OurWhisperCfg

        msp = int(whisper_chunk_s) * 50
        if size == "tiny":
            arch = OurWhisperCfg(d_model=64, num_hidden_layers=2,
                                 num_attention_heads=4, ffn_dim=128,
                                 num_mel_bins=80, max_source_positions=msp)
        else:  # whisper-base geometry
            arch = OurWhisperCfg(max_source_positions=msp)
        params = convert_whisper_encoder(torch_model.state_dict(), arch)
    enc = FrozenEncoder(name=encoder, model_name=f"ab-{size}",
                        arch_cfg=arch, params=params, pretrained=True,
                        layers_to_use=(-4, -3, -2, -1),
                        whisper_pad_seconds=float(whisper_chunk_s))
    splits = load_manifests(data_path, data_fraction=cfg.data_fraction,
                            train_split=cfg.train_split,
                            seed=split_seed)
    pipe = DetectionPipeline(cfg, encoder=enc)
    return pipe, splits


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", default="/tmp/synth400")
    p.add_argument("--encoder", default="wav2vec2",
                   choices=["wav2vec2", "wavlm", "whisper"])
    p.add_argument("--size", default="tiny", choices=["tiny", "base"],
                   help="base = the real architecture the reference loads "
                        "(768-d/12-layer w2v2+wavlm, whisper-base) at "
                        "random init — the full-size end-to-end A/B")
    p.add_argument("--whisper_chunk_s", type=int, default=30,
                   help="whisper frontend pad-to seconds on BOTH sides "
                        "(30 = production parity; 4 breaks the random-"
                        "weight near-tie degeneracy for the retrieval "
                        "probe)")
    p.add_argument("--whisper_init_scale", type=float, default=1.0,
                   help="multiply whisper encoder matmul weights (not "
                        "LayerNorms) by this factor on BOTH sides: "
                        "variance-scaled weights de-degenerate the "
                        "random-init retrieval probe (round-3 near-tie "
                        "diagnostic)")
    p.add_argument("--torch_seed", type=int, default=None,
                   help="re-seed torch AFTER encoder build: varies the "
                        "reference's RADADModel init/dropout/shuffle for "
                        "the multi-seed training A/B")
    p.add_argument("--our_seed", type=int, default=None,
                   help="our config.random_seed (init/dropout/shuffle); "
                        "the train/val split stays on the parity seed")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--out", default="/tmp/ab_reference")
    p.add_argument("--probe_batch", type=int, default=32,
                   help="batch size for the embedding/retrieval parity "
                        "probes")
    p.add_argument("--skip_retrieval", action="store_true",
                   help="stop after the embedding-parity probe (the "
                        "retrieval probe's reference-side DB build is "
                        "hours of CPU torch at whisper-base 30 s "
                        "geometry)")
    p.add_argument("--probes_only", action="store_true",
                   help="run only the exactness probes (1)+(2), skip the "
                        "training comparison — the mode the slow pytest "
                        "regression uses")
    p.add_argument("--record_out",
                   default=os.path.join("experiments", "ab_reference.json"))
    args = p.parse_args()
    os.environ.setdefault("MPLBACKEND", "Agg")

    install_shims()
    torch_model = patch_transformers(args.encoder, args.size,
                                     args.whisper_chunk_s,
                                     args.whisper_init_scale)
    import torch

    # tiny runs are dispatch-bound (1 thread = reproducible timing); the
    # full-size probes are compute-bound on 12-layer 768-d CPU forwards
    torch.set_num_threads(1 if args.size == "tiny" else 4)

    ref_root = os.path.join(args.out, "ref")
    our_root = os.path.join(args.out, "ours")
    os.makedirs(ref_root, exist_ok=True)
    ref_pipe, ref_train, ref_val = run_reference(
        args.data_path, ref_root, args.epochs, args.batch_size,
        args.encoder, torch_seed=args.torch_seed)
    our_pipe, splits = run_ours(
        args.data_path, our_root, args.epochs, args.batch_size,
        torch_model, args.encoder, size=args.size,
        whisper_chunk_s=args.whisper_chunk_s, our_seed=args.our_seed)

    record = {"data_path": args.data_path, "encoder": args.encoder,
              "epochs": args.epochs, "size": args.size,
              "batch_size": args.batch_size,
              "arch": (TINY_KW if args.size == "tiny"
                       else "reference-base (HF config defaults)")}
    if args.encoder == "whisper":
        record["whisper_chunk_s"] = args.whisper_chunk_s
        record["whisper_init_scale"] = args.whisper_init_scale
    if args.torch_seed is not None or args.our_seed is not None:
        record["seeds"] = {"torch": args.torch_seed, "ours": args.our_seed}

    # ---- (1) embedding parity over the full val split --------------------
    our_val = splits["val"]
    assert sorted(os.path.basename(p_) for p_ in our_val.paths) == sorted(
        os.path.basename(p_) for p_ in ref_val.audio_files), \
        "train/val split membership differs"
    our_emb = our_pipe.get_embeddings(our_val)
    by_base = {os.path.basename(p_): i for i, p_ in enumerate(our_val.paths)}
    diffs, ref_emb_rows, ref_paths_order = [], {}, []
    bs = args.probe_batch
    for lo in range(0, len(ref_val.audio_files), bs):
        paths = ref_val.audio_files[lo:lo + bs]
        emb = ref_pipe.process_audio_batch(paths, ref_val).numpy()
        for p_, e in zip(paths, emb):
            ours = our_emb[by_base[os.path.basename(p_)]]
            diffs.append(float(np.max(np.abs(e - ours))))
            ref_emb_rows[os.path.basename(p_)] = e
        ref_paths_order.extend(paths)
    scale = float(np.median(np.abs(our_emb))) or 1.0
    record["embedding_parity"] = {
        "clips": len(diffs), "max_abs_diff": max(diffs),
        "median_abs_scale": scale,
        "max_rel_diff": max(diffs) / scale}
    print(f"# embeddings: {len(diffs)} clips, max|Δ|={max(diffs):.3e} "
          f"(scale {scale:.3f})", file=sys.stderr)

    if args.skip_retrieval:
        # Embedding-parity-only record (the full-size whisper 30 s-parity
        # point: the reference's CPU-torch DB build over the train split
        # takes hours at that geometry; the 32-clip embedding A/B is the
        # contract this mode pins).
        _write_record(args.record_out, record)
        return

    # ---- (2) retrieval parity --------------------------------------------
    # Build BOTH DBs over the train split, then ask both sides for the
    # top-5 self-excluded neighbors of one val probe batch.
    ref_pipe.build_vector_database(ref_train)
    our_pipe.build_vector_database(splits["train"])
    probe = ref_paths_order[:args.probe_batch]
    ref_emb_probe = np.stack(
        [ref_emb_rows[os.path.basename(p_)] for p_ in probe])
    _, _, ref_npaths, ref_ndists = ref_pipe.retrieve_similar_vectors(
        torch.from_numpy(ref_emb_probe), query_paths=probe,
        exclude_self=True, return_info=True, return_distances=True)

    our_q = np.stack([our_emb[by_base[os.path.basename(p_)]]
                      for p_ in probe])
    excl = {os.path.basename(p_) for p_ in probe}
    # 6 neighbors: the 5→6 gap is the near-tie diagnostic denominator
    our_d6, our_idx6 = our_pipe.index.search_overfetch(
        our_q, 6, exclude_basenames=excl)
    our_idx = our_idx6[:, :5]
    order_match = set_match = 0
    for r in range(len(probe)):
        ref_row = [os.path.basename(p_) for p_ in ref_npaths[r] if p_]
        our_row = [os.path.basename(our_pipe.index.paths[int(i)])
                   for i in our_idx[r] if i >= 0]
        order_match += int(ref_row == our_row)
        set_match += int(set(ref_row) == set(our_row))
    # Near-tie diagnostic: id-level matches are meaningless when the
    # 5th→6th neighbor gap sits at the cross-implementation noise floor
    # (e.g. whisper's 30 s zero-pad with random tiny weights makes every
    # clip embedding nearly identical). Compare the distance SPECTRA:
    # if the two top-5 lists carry the same distances to within the
    # embedding-parity bound while the 5→6 gap is no larger, the
    # implementations agree and the ids are tie lottery.
    ref_d = np.asarray(ref_ndists, np.float64)
    spec_dev, gaps, d5s, mm_gaps = [], [], [], []
    for r in range(len(probe)):
        rd = np.sort(ref_d[r][np.isfinite(ref_d[r])])[:5]
        od = np.sort(np.asarray(our_d6[r][:5], np.float64))
        m = min(len(rd), len(od))
        if m:
            spec_dev.append(float(np.max(np.abs(rd[:m] - od[:m]))))
            d5s.append(float(od[m - 1]))
        if np.isfinite(our_d6[r][5]) if our_d6.shape[1] > 5 else False:
            gaps.append(float(our_d6[r][5] - our_d6[r][4]))
        # a mismatching query whose smallest adjacent top-6 gap sits at
        # the cross-implementation noise floor is tie lottery, not a
        # retrieval divergence
        ref_row_r = [os.path.basename(p_) for p_ in ref_npaths[r] if p_]
        our_row_r = [os.path.basename(our_pipe.index.paths[int(i)])
                     for i in our_idx[r] if i >= 0]
        if ref_row_r != our_row_r:
            od6 = np.asarray(our_d6[r], np.float64)
            od6 = od6[np.isfinite(od6)]
            mm_gaps.append(float(np.min(np.diff(np.sort(od6)))))
    record["retrieval_parity"] = {
        "queries": len(probe), "k": 5,
        "exact_order_match": order_match / len(probe),
        "set_match": set_match / len(probe),
        "near_tie_diagnostic": {
            "top5_spectrum_max_dev": max(spec_dev) if spec_dev else None,
            "gap_5_to_6_median": (float(np.median(gaps))
                                  if gaps else None),
            "d5_median": float(np.median(d5s)) if d5s else None,
            "mismatch_min_adjacent_gaps": mm_gaps,
            "note": ("id-level matches are tie-bound when "
                     "gap_5_to_6_median (or a mismatching query's min "
                     "adjacent gap) <~ top5_spectrum_max_dev")}}
    print(f"# retrieval: order={order_match}/{len(probe)} "
          f"set={set_match}/{len(probe)}", file=sys.stderr)

    # ---- (3) trained quality ---------------------------------------------
    if not args.probes_only:
        import csv

        def _traj(path, eer_col, auc_col):
            with open(path) as f:
                rows = list(csv.DictReader(f))
            return ([round(float(r[eer_col]), 2) for r in rows],
                    [round(float(r[auc_col]), 4) for r in rows])

        t0 = time.time()
        ref_pipe.train(ref_train, ref_val)
        ref_wall = time.time() - t0
        with open(os.path.join(ref_root, "summary.json")) as f:
            ref_summary = json.load(f)
        eers, aucs = _traj(os.path.join(ref_root, "metrics.csv"),
                           "eer_percent", "auc")
        record["reference"] = {
            "wall_sec": round(ref_wall, 1),
            "best_by_eer": ref_summary.get("best_by_eer"),
            "eer_by_epoch": eers, "auc_by_epoch": aucs,
            "final": {k: ref_summary.get("last_row", {}).get(k) for k in (
                "eer_percent", "macro_eer_percent", "auc", "val_acc",
                "val_loss")}}

        t0 = time.time()
        last = our_pipe.train(splits["train"], splits["val"])
        our_wall = time.time() - t0
        eers, aucs = _traj(os.path.join(our_root, "metrics.csv"),
                           "eer_percent", "auc")
        record["ours"] = {
            "wall_sec": round(our_wall, 1),
            "best_by_eer": our_pipe.writer.best_by_eer,
            "eer_by_epoch": eers, "auc_by_epoch": aucs,
            "final": {k: last.get(k) for k in (
                "eer_percent", "macro_eer_percent", "auc", "val_acc",
                "val_loss")}}

    _write_record(args.record_out, record)


def _write_record(out_path, record):
    existing = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            existing = json.load(f)
    existing.append(record)
    with open(out_path, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
