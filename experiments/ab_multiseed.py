"""Multi-seed training-dynamics A/B vs the executed reference (VERDICT
r3 #4): the round-3 A/B compared ONE seed per encoder family and called
the trajectories "the same band". With optimizer parity pinned
step-for-step (tests/test_optim.py) the residual run-to-run variation is
init/dropout/shuffle RNG — so measure it: N seeds per framework per
family, report the EER/AUC distributions side by side.

Each seed launches ``ab_reference.py`` in a subprocess (the shims +
transformers monkeypatches are process-global): the ENCODER weights stay
the shared seed-0 draw on both sides; ``--torch_seed``/``--our_seed``
vary only what the frameworks re-draw per run — fusion-model init,
dropout masks, shuffle order (reference pipeline.py:73-109,776-780 vs
our DetectionPipeline._rng). The train/val split stays pinned at the
parity seed on both sides.

Writes ONE summary record (per-seed metrics + mean/sd + overlap verdict)
to experiments/ab_reference.json under ``kind: "multiseed"``.

Usage (CPU; ~tiny-arch minutes per seed):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/ab_multiseed.py \
      --data_path /tmp/synth400 --encoders wav2vec2,wavlm --seeds 5
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(data_path, encoder, seed, epochs, batch_size, out_dir):
    rec_path = os.path.join(out_dir, f"rec_{encoder}_{seed}.json")
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               MPLBACKEND="Agg")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "experiments",
                                      "ab_reference.py"),
         "--data_path", data_path, "--encoder", encoder,
         "--epochs", str(epochs), "--batch_size", str(batch_size),
         "--torch_seed", str(seed), "--our_seed", str(seed),
         "--out", os.path.join(out_dir, f"run_{encoder}_{seed}"),
         "--record_out", rec_path],
        check=True, env=env, cwd=REPO,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    rec = json.load(open(rec_path))[-1]
    out = {}
    for side in ("reference", "ours"):
        r = rec[side]
        out[side] = {
            "best_eer": (r.get("best_by_eer") or {}).get("eer_percent",
                                                         None),
            "final_eer": r["final"].get("eer_percent"),
            "final_auc": r["final"].get("auc"),
            "min_eer_traj": min(r["eer_by_epoch"]),
            "max_auc_traj": max(r["auc_by_epoch"]),
        }
    return out


def summarize(rows, key):
    vals = [r[key] for r in rows if r.get(key) is not None]
    if not vals:
        return None
    return {"mean": round(statistics.fmean(vals), 3),
            "sd": round(statistics.stdev(vals), 3) if len(vals) > 1
            else 0.0,
            "min": round(min(vals), 3), "max": round(max(vals), 3),
            "values": [round(v, 3) for v in vals]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", default="/tmp/synth400")
    p.add_argument("--encoders", default="wav2vec2,wavlm")
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--record_out",
                   default=os.path.join("experiments", "ab_reference.json"))
    args = p.parse_args()

    record = {"kind": "multiseed", "data_path": args.data_path,
              "seeds": args.seeds, "epochs": args.epochs,
              "families": {}}
    with tempfile.TemporaryDirectory() as tmp:
        for enc in args.encoders.split(","):
            per_side = {"reference": [], "ours": []}
            for s in range(args.seeds):
                r = run_one(args.data_path, enc, 1000 + s, args.epochs,
                            args.batch_size, tmp)
                for side in per_side:
                    per_side[side].append(r[side])
                print(f"# {enc} seed {s}: ref min-EER "
                      f"{r['reference']['min_eer_traj']:.1f} / ours "
                      f"{r['ours']['min_eer_traj']:.1f}", file=sys.stderr)
            fam = {}
            for side, rows in per_side.items():
                fam[side] = {k: summarize(rows, k) for k in
                             ("min_eer_traj", "final_eer", "final_auc",
                              "max_auc_traj")}
            # overlap verdict on the metric that matters (best EER over
            # the trajectory): distributions overlap when each mean lies
            # within 2 sd of the other
            a = fam["reference"]["min_eer_traj"]
            b = fam["ours"]["min_eer_traj"]
            if a and b:
                tol_a = 2 * max(a["sd"], 1e-9)
                tol_b = 2 * max(b["sd"], 1e-9)
                fam["overlap_min_eer"] = bool(
                    abs(a["mean"] - b["mean"]) <= max(tol_a, tol_b))
            record["families"][enc] = fam

    existing = []
    if os.path.exists(args.record_out):
        existing = json.load(open(args.record_out))
    existing.append(record)
    with open(args.record_out, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
