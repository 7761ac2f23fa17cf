"""Linear-probe calibration of the hard-mode synthetic benchmark.

The hard-mode generator (make_synthetic_dataset.py --hard) must land the
detection task in a SENSITIVE EER band for the target encoder: saturated
(EER 0) can't catch quality regressions, chance (EER 50) can't either.
This script sweeps the ``--hard_strength`` artifact multiplier, embeds a
small probe set with the production encoder at random init (the same
init build_encoder uses), fits a logistic-regression probe on the TPP
embeddings, and reports probe AUC / EER per strength.

The probe is a LOWER bound on the trainable model (projection + retrieval
+ detection head trained on 60x the data), so pick a strength whose probe
AUC is ~0.75-0.92: the full ITW-scale run then lands in the useful
3-20 % EER band.

Run on CPU (no TPU contention):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/probe_hardness.py
"""

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def probe(strength: float, n: int = 360, seed: int = 5) -> dict:
    from sklearn.linear_model import LogisticRegression
    from sklearn.model_selection import train_test_split
    from sklearn.preprocessing import StandardScaler

    from radad_tpu.config import Config
    from radad_tpu.data.manifest import load_manifests
    from radad_tpu.models.encoder import build_encoder
    from radad_tpu.train.metrics import auc as auc_fn
    from radad_tpu.train.metrics import compute_eer, roc_curve
    from radad_tpu.train.pipeline import DetectionPipeline

    with tempfile.TemporaryDirectory() as tmp:
        subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "make_synthetic_dataset.py"),
             "--out", tmp, "--n", str(n), "--speakers", "13", "--hard",
             "--families", "inharmonic,quantize,buzz",
             "--seed", str(seed), "--hard_strength", str(strength)],
            check=True, capture_output=True)
        cfg = Config().replace(
            train_data_path=tmp, test_data_path=tmp, data_root=tmp,
            vector_db_path=os.path.join(tmp, "db"),
            feature_extractor_type="wav2vec2", data_fraction=1.0)
        splits = load_manifests(tmp, data_fraction=1.0,
                                train_split=cfg.train_split,
                                seed=cfg.random_seed)
        pipe = DetectionPipeline(cfg, encoder=build_encoder(cfg))
        x = np.concatenate([pipe.get_embeddings(splits["train"]),
                            pipe.get_embeddings(splits["val"])])
        y = np.concatenate([splits["train"].labels, splits["val"].labels])

    xtr, xte, ytr, yte = train_test_split(
        x, y, test_size=0.33, stratify=y, random_state=0)
    sc = StandardScaler().fit(xtr)
    clf = LogisticRegression(max_iter=2000, C=0.1)
    clf.fit(sc.transform(xtr), ytr)
    s = clf.decision_function(sc.transform(xte))
    fpr, tpr, _ = roc_curve(s, yte)
    eer, _ = compute_eer(s, yte)
    return {"strength": strength, "auc": float(auc_fn(fpr, tpr)),
            "eer": float(eer)}  # compute_eer returns percent


def main():
    strengths = ([float(a) for a in sys.argv[1:]]
                 if len(sys.argv) > 1 else [1.0, 2.0, 4.0, 8.0])
    for st in strengths:
        r = probe(st)
        print(f"strength {r['strength']:5.2f}: probe AUC {r['auc']:.3f}  "
              f"EER {r['eer']:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
