"""Diagnostic for the SESSION-mode synthetic benchmark: does retrieval
carry information the query alone lacks?

Session mode (make_synthetic_dataset.py --session_size) groups clips into
label-pure recording sessions sharing a channel fingerprint while the
per-clip artifact strength stays independent half-normal. For the
benchmark to be retrieval-sensitive, two things must hold, and this
script measures both BEFORE spending a full training run:

1. **Neighbor session coherence** — a val query's top-k neighbors in the
   train DB are its session-mates (the fingerprint dominates TPP
   distance). Reported as the fraction of top-5 neighbors sharing the
   query's session.
2. **Information asymmetry** — a linear probe on
   [query TPP ; mean neighbor TPP] beats a probe on the query TPP alone
   (the exact pair of inputs the fusion model consumes,
   reference radad_model.py:32-41). Reported as probe AUC for both.

Run on CPU (no TPU contention):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/probe_sessions.py
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def probe(n: int, session_size: int, strength: float, seed: int,
          speakers: int, families: str, data_dir: str = None,
          session_fp: float = 1.0, session_anchors: int = 8) -> dict:
    from sklearn.linear_model import LogisticRegression
    from sklearn.preprocessing import StandardScaler

    from radad_tpu.config import Config
    from radad_tpu.data.manifest import load_manifests
    from radad_tpu.index.flat import FlatIndex
    from radad_tpu.models.encoder import build_encoder
    from radad_tpu.train.metrics import auc as auc_fn
    from radad_tpu.train.metrics import compute_eer, roc_curve
    from radad_tpu.train.pipeline import DetectionPipeline

    tmp_ctx = tempfile.TemporaryDirectory() if data_dir is None else None
    tmp = data_dir if data_dir is not None else tmp_ctx.name
    try:
        if data_dir is not None:
            # session_fp/n describe GENERATION; a reused dir's truth is in
            # its session_params.json provenance (or null for dirs
            # generated before that file existed) — never the CLI args
            # (ADVICE r3).
            n = session_size = session_fp = session_anchors = None
            pp = os.path.join(tmp, "session_params.json")
            if os.path.exists(pp):
                with open(pp) as f:
                    prov = json.load(f)
                n = prov.get("n")
                session_size = prov.get("session_size")
                session_fp = prov.get("session_fp")
                session_anchors = prov.get("session_anchors")
        if data_dir is None:
            cmd = [sys.executable,
                   os.path.join(os.path.dirname(__file__),
                                "make_synthetic_dataset.py"),
                   "--out", tmp, "--n", str(n),
                   "--speakers", str(speakers), "--hard",
                   "--families", families, "--seed", str(seed),
                   "--hard_strength", str(strength)]
            if session_size > 0:
                cmd += ["--session_size", str(session_size),
                        "--session_fp", str(session_fp),
                        "--session_anchors", str(session_anchors)]
            subprocess.run(cmd, check=True, capture_output=True)
        with open(os.path.join(tmp, "sessions.json")) as f:
            session_of = json.load(f)

        cfg = Config().replace(
            train_data_path=tmp, test_data_path=tmp, data_root=tmp,
            vector_db_path=os.path.join(tmp, "db"),
            feature_extractor_type="wav2vec2", data_fraction=1.0)
        splits = load_manifests(tmp, data_fraction=1.0,
                                train_split=cfg.train_split,
                                seed=cfg.random_seed)
        pipe = DetectionPipeline(cfg, encoder=build_encoder(cfg))
        xtr = np.asarray(pipe.get_embeddings(splits["train"]),
                         dtype=np.float32)
        xva = np.asarray(pipe.get_embeddings(splits["val"]),
                         dtype=np.float32)
        ytr = np.asarray(splits["train"].labels, dtype=np.float32)
        yva = np.asarray(splits["val"].labels, dtype=np.float32)
        names_tr = [os.path.basename(p) for p in splits["train"].paths]
        names_va = [os.path.basename(p) for p in splits["val"].paths]
    finally:
        if tmp_ctx is not None and data_dir is None:
            pass  # cleaned below after neighbor fetch uses xtr only

    # train-DB retrieval for both splits (self-excluded for train queries,
    # mirroring the production exclude path)
    idx = FlatIndex(xtr.shape[1], "L2")
    idx.add(xtr, ytr.tolist(), names_tr)
    k = 5

    def neighbors(q, exclude_self_rank=False):
        d, ii = idx.search(q, k + (1 if exclude_self_rank else 0))
        ii = np.asarray(ii)
        if exclude_self_rank:
            # drop rank-0 (the query itself is in the DB)
            ii = ii[:, 1:]
        return ii

    ii_tr = neighbors(xtr, exclude_self_rank=True)
    ii_va = neighbors(xva, exclude_self_rank=False)

    # --- 1. session coherence of val neighbors
    sess_va = np.array([session_of[n_] for n_ in names_va])
    sess_tr = np.array([session_of[n_] for n_ in names_tr])
    coh = float(np.mean(sess_tr[ii_va] == sess_va[:, None]))

    # --- 2. linear probes: query-only vs query + mean-neighbor
    def fit_eval(feats_tr, feats_va):
        sc = StandardScaler().fit(feats_tr)
        clf = LogisticRegression(max_iter=2000, C=0.1)
        clf.fit(sc.transform(feats_tr), ytr)
        s = clf.decision_function(sc.transform(feats_va))
        fpr, tpr, _ = roc_curve(s, yva)
        eer, _ = compute_eer(s, yva)
        return float(auc_fn(fpr, tpr)), float(eer)

    mean_nb_tr = xtr[ii_tr].mean(axis=1)
    mean_nb_va = xtr[ii_va].mean(axis=1)
    auc_q, eer_q = fit_eval(xtr, xva)
    auc_qn, eer_qn = fit_eval(np.concatenate([xtr, mean_nb_tr], axis=1),
                              np.concatenate([xva, mean_nb_va], axis=1))
    # neighbors-ONLY probe: the ceiling target for config.ablate_query
    # runs (the fusion model's neighbor path sees only neighbor vectors,
    # radad_model.py:32-41 — labels/distances never reach the model)
    auc_n, eer_n = fit_eval(mean_nb_tr, mean_nb_va)
    if tmp_ctx is not None:
        tmp_ctx.cleanup()
    return {"n": n, "n_train": len(names_tr), "n_val": len(names_va),
            "session_size": session_size, "strength": strength,
            "session_fp": session_fp, "session_anchors": session_anchors,
            "neighbor_session_coherence": coh,
            "probe_query_only": {"auc": auc_q, "eer": eer_q},
            "probe_neighbors_only": {"auc": auc_n, "eer": eer_n},
            "probe_query_plus_neighbors": {"auc": auc_qn, "eer": eer_qn}}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1600)
    p.add_argument("--session_size", type=int, default=8)
    p.add_argument("--strength", type=float, default=8.0)
    p.add_argument("--seed", type=int, default=5)
    p.add_argument("--speakers", type=int, default=79)
    p.add_argument("--families", default="inharmonic,quantize,buzz")
    p.add_argument("--session_fp", type=float, default=1.0)
    p.add_argument("--session_anchors", type=int, default=8)
    p.add_argument("--data_dir", default=None,
                   help="reuse an existing generated dataset dir")
    args = p.parse_args()
    r = probe(args.n, args.session_size, args.strength, args.seed,
              args.speakers, args.families, data_dir=args.data_dir,
              session_fp=args.session_fp,
              session_anchors=args.session_anchors)
    print(json.dumps(r, indent=2))


if __name__ == "__main__":
    main()
