"""Experiment runner: the reference's Colab notebooks as a parameterized
script.

Each upstream notebook (``/root/reference/experiments/**``) embeds the
main.py body with two modes selected by a ``pipeline_check`` flag (cell 3):
a smoke run (data_fraction=0.01, 2 epochs) and the full run
(data_fraction=1.0, 10 epochs, batch 256). This script reproduces exactly
those configurations for any dataset/encoder pair and appends the headline
numbers to ``experiments/results.jsonl``.

Examples (datasets are external — point --data_path at a directory with
meta.csv + audio, e.g. Release-In-The-Wild or FakeAVCeleb audio):

  # smoke-check the plumbing (1% data, 2 epochs)
  python experiments/run_experiment.py --data_path /data/itw \
      --encoder wav2vec2 --pipeline_check

  # full In-the-Wild wav2vec2 run (reference best: 16.72% EER, BASELINE.md)
  python experiments/run_experiment.py --data_path /data/itw \
      --encoder wav2vec2 --name ritw_wav2vec2
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import json
import logging
import time


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True,
                   help="dir with meta.csv + audio files")
    p.add_argument("--encoder", default="wav2vec2",
                   choices=["wav2vec2", "wavlm", "whisper", "hubert"])
    p.add_argument("--name", default=None, help="experiment name")
    p.add_argument("--data_root", default=None, help="output root")
    p.add_argument("--pipeline_check", action="store_true",
                   help="smoke mode: data_fraction=0.01, 2 epochs")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--patience", type=int, default=None,
                   help="early_stopping_patience override (epochs without "
                        "a val-EER improvement before stopping; config "
                        "default 5). The session-mode benchmark's "
                        "neighbor path learns slowly after the query "
                        "path plateaus - patience 5 cuts long runs "
                        "mid-learning")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--proj_dim", type=int, default=None,
                   help="projection_output_dim override (reference "
                        "config.py:60 knob; default 128). The session "
                        "benchmark's at-scale null is consistent with "
                        "the 128-d projection saturating at ~4k "
                        "sessions - this tests the capacity hypothesis")
    p.add_argument("--data_fraction", type=float, default=1.0)
    p.add_argument("--weights_dir", default=None)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--mixed_precision", action="store_true",
                   help="use_mixed_precision=True: encoder forward in "
                        "bfloat16 (compute_dtype) — measured 1.69x encoder "
                        "throughput on v5e; this flag exists to record the "
                        "metric delta vs the f32 default (reference AMP "
                        "flag: config.py:73-87)")
    p.add_argument("--eval_data_path", default=None,
                   help="optional SECOND dataset dir (meta.csv + audio) "
                        "evaluated with the trained model after the run — "
                        "use a generator dir with disjoint attack "
                        "families/speakers for generalization records")
    p.add_argument("--ablate_retrieval", action="store_true",
                   help="zero the retrieved neighbors in train/eval steps "
                        "(config.ablate_retrieval): measures how much the "
                        "retrieval path contributes to EER")
    p.add_argument("--ablate_query", action="store_true",
                   help="neighbors-ONLY diagnostic (config.ablate_query): "
                        "the fusion model sees a zeroed query vector while "
                        "retrieval still uses the real one — isolates "
                        "whether the fusion architecture can extract the "
                        "neighbor signal at all")
    p.add_argument("--freeze_query_epochs", type=int, default=0,
                   help="curriculum (config.freeze_query_epochs): train "
                        "the first N epochs neighbors-only, then joint — "
                        "keeps the query path from drowning the neighbor "
                        "gradient early")
    p.add_argument("--top_k", type=int, default=None,
                   help="retrieved-neighbor count override (reference "
                        "config.py:56 knob; default 5). Session size 8 "
                        "leaves 7 mates in-DB — k=5 caps the evidence "
                        "the attention path can aggregate")
    p.add_argument("--model_name", default=None,
                   help="HF model id overriding the encoder family's "
                        "default size (e.g. facebook/wav2vec2-large-lv60, "
                        "microsoft/wavlm-large, openai/whisper-small) — "
                        "architecture resolves from the preset table / a "
                        "local config.json (models/encoder.py); weights "
                        "load when a local checkpoint exists")
    p.add_argument("--whisper_fast", action="store_true",
                   help="whisper_pad_seconds=None: encode only the real "
                        "frames instead of padding every segment to 30 s "
                        "(reference feature_extractor.py:94-113 parity is "
                        "the 30 s default; this is the TPU-fast variant)")
    args = p.parse_args()

    name = args.name or (
        f"{os.path.basename(args.data_path.rstrip('/'))}_{args.encoder}"
        + ("_check" if args.pipeline_check else ""))
    data_root = args.data_root or os.path.join("runs", name)

    from radad_tpu.config import Config
    from radad_tpu.data.manifest import load_manifests
    from radad_tpu.models.encoder import build_encoder
    from radad_tpu.train.pipeline import (DetectionPipeline,
                                          print_dataset_statistics)

    # Notebook cell-3 configuration (reference experiments)
    data_fraction = 0.01 if args.pipeline_check else args.data_fraction
    epochs = 2 if args.pipeline_check else args.epochs
    cfg = Config().replace(
        train_data_path=args.data_path, test_data_path=args.data_path,
        data_root=data_root,
        vector_db_path=os.path.join(data_root, "vector_db"),
        feature_extractor_type=args.encoder,
        data_fraction=data_fraction, num_epochs=epochs,
        batch_size=args.batch_size, eval_batch_size=args.batch_size,
        db_batch_size=64, use_batch_norm=False, use_layer_norm=True,
        usewandb=args.wandb,
        use_mixed_precision=args.mixed_precision,
        ablate_retrieval=args.ablate_retrieval,
        ablate_query=args.ablate_query,
        freeze_query_epochs=args.freeze_query_epochs,
        whisper_pad_seconds=None if args.whisper_fast else 30.0)
    if args.top_k is not None:
        cfg = cfg.replace(top_k=args.top_k)
    if args.patience is not None:
        cfg = cfg.replace(early_stopping_patience=args.patience)
    if args.proj_dim is not None:
        cfg = cfg.replace(projection_output_dim=args.proj_dim)
    if args.model_name:
        cfg = cfg.replace(**{f"{args.encoder}_model_name": args.model_name})

    splits = load_manifests(
        args.data_path, data_fraction=cfg.data_fraction,
        train_split=cfg.train_split, seed=cfg.random_seed)
    print_dataset_statistics(splits)

    encoder = build_encoder(cfg, weights_dir=args.weights_dir)
    if not encoder.pretrained:
        logging.warning(
            "RANDOM encoder weights — metric numbers will not match the "
            "published baselines; place HF checkpoints under "
            "%s/weights/<model-name>/", data_root)

    pipe = DetectionPipeline(cfg, encoder=encoder)
    t0 = time.time()
    last = pipe.train(splits["train"], splits["val"])
    wall = time.time() - t0

    heldout = None
    if args.eval_data_path:
        # evaluate the trained model on a fully held-out manifest
        # (disjoint families/speakers when the generator was asked for
        # them) — data_fraction=1.0: the eval dir is used whole
        ev = load_manifests(args.eval_data_path, data_fraction=1.0,
                            split=False, seed=cfg.random_seed)
        res = pipe.evaluate(ev["all"])
        heldout = {k: res.get(k) for k in (
            "eer_percent", "macro_eer_percent", "auc", "accuracy",
            "num_samples")}

    record = {
        "name": name,
        "encoder": args.encoder,
        "model_name": args.model_name,
        "whisper_fast": bool(args.whisper_fast),
        "mixed_precision": bool(args.mixed_precision),
        "ablate_retrieval": bool(args.ablate_retrieval),
        "ablate_query": bool(args.ablate_query),
        "freeze_query_epochs": args.freeze_query_epochs,
        "top_k": cfg.top_k,
        "heldout_eval": heldout,
        "pretrained_weights": encoder.pretrained,
        "data_fraction": data_fraction,
        "epochs": epochs,
        "train_size": len(splits["train"]),
        "val_size": len(splits["val"]),
        "wall_time_sec": round(wall, 1),
        "final": {k: last.get(k) for k in (
            "eer_percent", "macro_eer_percent", "auc", "val_acc",
            "val_loss", "epoch_time_sec")},
        "best_by_eer": pipe.writer.best_by_eer,
    }
    os.makedirs("experiments", exist_ok=True)
    with open(os.path.join("experiments", "results.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
