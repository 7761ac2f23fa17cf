"""Generate a synthetic spoof/bona-fide WAV dataset in the reference's
meta.csv schema (``/root/reference/meta.csv``: file,speaker,label with
'spoof'/'bona-fide' strings).

Real deepfake corpora (Release-In-The-Wild, FakeAVCeleb) are external and
not redistributable; this generator provides a committed, reproducible
end-to-end experiment substrate. The two classes are acoustically
separable by design, loosely mimicking vocoder artifacts:

  * bona-fide: harmonic series (5 partials, 1/k amplitude decay) with
    slow vibrato and pink-ish noise floor;
  * spoof: same voice model plus synthesis artifacts — a strong
    inharmonic partial (metallic resonance), amplitude-quantization
    distortion, and a periodic frame-boundary buzz at 50 Hz.

Speakers differ by fundamental frequency. Durations vary 1-4 s so the
segmenter's pad/window logic is exercised (reference dataset.py:139-153
truncates to 3 s).

Usage:
  python experiments/make_synthetic_dataset.py --out /tmp/synth --n 400
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_clip(rng: np.random.Generator, f0: float, dur: float, sr: int,
               spoof: bool) -> np.ndarray:
    t = np.arange(int(sr * dur)) / sr
    vibrato = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t + rng.uniform(0, 6.28))
    wave = np.zeros_like(t)
    for h in range(1, 6):
        wave += (1.0 / h) * np.sin(2 * np.pi * h * f0 * vibrato * t
                                   + rng.uniform(0, 6.28))
    wave *= 0.25
    # pink-ish noise floor
    noise = rng.standard_normal(len(t))
    noise = np.cumsum(noise) / np.sqrt(np.arange(1, len(t) + 1))
    wave += 0.02 * noise / (np.std(noise) + 1e-9)
    if spoof:
        # inharmonic metallic partial
        wave += 0.12 * np.sin(2 * np.pi * (2.41 * f0) * t
                              + rng.uniform(0, 6.28))
        # amplitude quantization (vocoder-style distortion)
        wave = np.round(wave * 48) / 48
        # frame-boundary buzz
        wave += 0.05 * np.sign(np.sin(2 * np.pi * 50.0 * t))
    envelope = np.minimum(1.0, np.minimum(t / 0.05, (dur - t) / 0.05))
    return (wave * envelope * 0.5).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=400)
    p.add_argument("--speakers", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--spoof_ratio", type=float, default=0.625,
                   help="fraction of spoof clips; default ~ITW's 62.5%%, "
                        "use 0.473 for FakeAVCeleb's 52.66%% bona-fide")
    args = p.parse_args()

    from radad_tpu.data.audio import write_wav

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    rows = []
    for i in range(args.n):
        spk = i % args.speakers
        f0 = 110.0 * (2.0 ** (spk / 12.0)) * rng.uniform(0.98, 1.02)
        dur = rng.uniform(1.0, 4.0)
        if args.spoof_ratio == 0.625:
            # original pattern, byte-for-byte reproducibility of the
            # committed synthetic400/synthetic2k/ITW-scale records (the
            # rng stream depends on the label sequence)
            label = "spoof" if i % 8 < 5 else "bona-fide"
        else:
            label = ("spoof"
                     if (i * args.spoof_ratio) % 1.0 + args.spoof_ratio
                     >= 1.0 else "bona-fide")  # deterministic ratio mix
        wave = synth_clip(rng, f0, dur, args.sr, label == "spoof")
        fname = f"clip_{i:05d}.wav"
        write_wav(os.path.join(args.out, fname), wave, args.sr)
        rows.append((fname, f"speaker_{spk:02d}", label))
    with open(os.path.join(args.out, "meta.csv"), "w") as f:
        f.write("file,speaker,label\n")
        for fname, spk, label in rows:
            f.write(f"{fname},{spk},{label}\n")
    print(f"wrote {args.n} clips + meta.csv under {args.out}")


if __name__ == "__main__":
    main()
