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


# ---------------------------------------------------------------------------
# HARD mode (VERDICT r2 #2): the legacy generator above is perfectly
# separable at scale — EER 0.00% from epoch 1, i.e. a benchmark that can't
# detect a quality regression. Hard mode constructs a task with an
# explicit, tunable Bayes floor so the at-scale EER lands in a sensitive
# band (~3-15%) where encoder/TPP/retrieval/fusion regressions MOVE the
# number:
#
#   * six spoof ATTACK FAMILIES (inharmonic partial, amplitude
#     quantization, frame buzz, synthesis lowpass, tremolo, mains-hum
#     + quantization) with per-clip artifact strength drawn from a
#     half-normal — a controlled fraction of spoof clips carries
#     near-undetectable artifacts (overlapping class distributions);
#   * bona-fide confounders: occasional weak hum / mild quantization /
#     band-limit, so "any artifact → spoof" is not a separating rule;
#   * additive pink noise at SNR ~ U(15, 35) dB and per-clip level jitter
#     ±6 dB on BOTH classes (masks weak artifacts stochastically);
#   * --families picks which attack families appear → generate train and
#     eval sets over DISJOINT families for generalization runs;
#   * --speaker_offset shifts the speaker id range → speaker-disjoint
#     eval sets (macro-EER over unseen speakers).
# ---------------------------------------------------------------------------

HARD_FAMILIES = ("inharmonic", "quantize", "buzz", "lowpass", "tremolo",
                 "hum")

# ---------------------------------------------------------------------------
# SESSION mode (hard mode +): makes the benchmark RETRIEVAL-SENSITIVE by
# construction. The plain hard-mode ablation is an honest null with a
# random frozen encoder (neighbors are the same random projection of the
# same per-clip statistics — no extra information; experiments/README.md
# "Retrieval ablation"). Session mode restores the information asymmetry
# RADAD's retrieval claim rests on: clips come in label-pure "recording
# sessions" (same speaker, same channel EQ, same background texture, same
# attack family) while the per-clip artifact STRENGTH stays independent
# half-normal. A weak-artifact query is near-unclassifiable alone, but its
# nearest neighbors in TPP space are its session-mates (the channel
# fingerprint dominates the embedding distance), and their vectors carry
# the session's average artifact evidence. The fingerprint itself is drawn
# from the SAME distribution for both classes — it is a retrieval KEY, not
# a label shortcut; neighbor labels are never fed to the model (reference
# radad_model.py:32-41 consumes only neighbor vectors).
# ---------------------------------------------------------------------------


def _session_eq_mask(gains_db, n, sr):
    """Smooth random EQ: interpolate anchor gains (log-spaced 50 Hz-7 kHz)
    over the rfft bins of an n-sample clip."""
    freqs = np.fft.rfftfreq(n, 1.0 / sr)
    anchors = np.geomspace(50.0, 7000.0, num=len(gains_db))
    logf = np.log(np.maximum(freqs, 1.0))
    gains = np.interp(logf, np.log(anchors), gains_db,
                      left=gains_db[0], right=gains_db[-1])
    return 10.0 ** (gains / 20.0)


def _apply_eq(wave, gains_db, sr):
    spec = np.fft.rfft(wave)
    spec *= _session_eq_mask(gains_db, len(wave), sr)
    return np.fft.irfft(spec, n=len(wave))


def make_session_params(rng: np.random.Generator, fp: float = 1.0,
                        anchors: int = 8) -> dict:
    """Draw one session's channel fingerprint + level/noise operating
    point. Identical distribution for spoof and bona-fide sessions.

    ``fp`` scales fingerprint SALIENCE: the shared cues (EQ depth,
    background texture level) grow with fp while per-clip jitter around
    the session operating point shrinks as 1/fp. fp=1 reproduces the
    original draws bit-for-bit (same rng stream). Calibrated with
    probe_sessions.py: fp=1 gives top-5 neighbor session coherence ~0.19
    (too weak for the retrieval-sensitivity claim); fp=4 peaks the
    probe's neighbor-information gain at the 1600-clip scale.

    ``anchors`` sets fingerprint ENTROPY (EQ anchor count): at ITW scale
    (~4k sessions) the default 8+8-gain fingerprint space crowds —
    top-5 neighbor session coherence measured 0.54 at 1600 clips but
    only 0.28 at 31,779 (fingerprint collisions), halving the probe's
    neighbor gain. More anchors give sessions more distinguishable
    channel signatures without raising per-clip salience."""
    return {
        # channel EQ: anchor gains ~ N(0, 5·fp dB) — a strong,
        # distinctive spectral tilt shared by every clip in the session
        "eq_gains_db": rng.normal(0.0, 5.0 * fp, size=anchors),
        # background texture: pink noise shaped by a second random EQ
        # (e.g. fan / room / codec noise signature of the session)
        "bg_gains_db": rng.normal(0.0, 8.0 * fp, size=anchors),
        # louder shared background as fp grows (−6 dB SNR per doubling)
        "snr_db": rng.uniform(18.0, 32.0) - 6.0 * np.log2(max(fp, 1e-6)),
        "level_db": rng.uniform(-5.0, 5.0),
        "dur": rng.uniform(1.6, 3.4),
        # per-clip jitter scale (SNR/level/dur wobble around the session
        # point) — channel properties get MORE stable as salience rises
        "jitter": 1.0 / fp,
    }


def _pink(rng, n):
    noise = rng.standard_normal(n)
    noise = np.cumsum(noise) / np.sqrt(np.arange(1, n + 1))
    return noise / (np.std(noise) + 1e-9)


def _lowpass(wave, sr, cutoff_hz):
    # one-pole IIR via FFT mask (cheap, artifact-free enough here)
    spec = np.fft.rfft(wave)
    freqs = np.fft.rfftfreq(len(wave), 1.0 / sr)
    spec *= 1.0 / np.sqrt(1.0 + (freqs / cutoff_hz) ** 6)
    return np.fft.irfft(spec, n=len(wave))


def synth_clip_hard(rng: np.random.Generator, f0: float, dur: float,
                    sr: int, spoof: bool, family: str,
                    strength: float = 1.0, session: dict = None
                    ) -> np.ndarray:
    t = np.arange(int(sr * dur)) / sr
    vibrato = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t + rng.uniform(0, 6.28))
    wave = np.zeros_like(t)
    for h in range(1, 6):
        wave += (1.0 / h) * np.sin(2 * np.pi * h * f0 * vibrato * t
                                   + rng.uniform(0, 6.28))
    wave *= 0.25

    # bona-fide confounders (weak spoof-like traits on the negative class)
    if not spoof:
        if rng.random() < 0.06:  # recording hum
            wave += 0.015 * np.sin(2 * np.pi * 50.0 * t)
        if rng.random() < 0.06:  # mild codec quantization
            wave = np.round(wave * 256) / 256
        if rng.random() < 0.06:  # narrow phone-like band
            wave = _lowpass(wave, sr, rng.uniform(3000, 5000))
    else:
        # half-normal strength: ~12% of spoofs below 0.35x nominal —
        # near the noise floor, deliberately hard or impossible.
        # ``strength`` scales the whole distribution: the knob that places
        # the task in a sensitive EER band for a given encoder (calibrated
        # with experiments/probe_hardness.py's linear-probe proxy).
        s = (abs(rng.normal(0.0, 1.0)) * 0.7 + 0.15) * strength
        if family == "inharmonic":
            wave += (0.10 * s) * np.sin(2 * np.pi * (2.41 * f0) * t
                                        + rng.uniform(0, 6.28))
        elif family == "quantize":
            levels = int(max(24, 160 / max(s, 1e-3)))
            wave = np.round(wave * levels) / levels
        elif family == "buzz":
            rate = rng.uniform(40.0, 80.0)
            wave += (0.04 * s) * np.sign(np.sin(2 * np.pi * rate * t))
        elif family == "lowpass":
            wave = _lowpass(wave, sr, 6000.0 / (1.0 + 2.0 * s))
        elif family == "tremolo":
            rate = rng.uniform(15.0, 30.0)
            wave *= 1.0 + (0.25 * s) * np.sin(2 * np.pi * rate * t)
        elif family == "hum":
            wave += (0.05 * s) * np.sin(2 * np.pi * 50.0 * t)
            wave = np.round(wave * 96) / 96

    if session is not None:
        # channel EQ on the (voice + artifact) signal: the session's
        # strongest shared cue — what makes session-mates near neighbors
        wave = _apply_eq(wave, session["eq_gains_db"], sr)
        # session background texture at the session operating SNR
        jit = session.get("jitter", 1.0)
        snr_db = session["snr_db"] + rng.uniform(-2.0, 2.0) * jit
        sig_rms = np.sqrt(np.mean(wave ** 2)) + 1e-9
        noise_rms = sig_rms / (10.0 ** (snr_db / 20.0))
        bg = _apply_eq(_pink(rng, len(t)), session["bg_gains_db"], sr)
        wave = wave + noise_rms * bg / (np.std(bg) + 1e-9)
        # per-clip level jitter is SMALL within a session (±1.5 dB around
        # the session level) — gain is a channel property, not clip noise
        wave *= 10.0 ** ((session["level_db"]
                          + rng.uniform(-1.5, 1.5) * jit) / 20.0)
    else:
        # additive pink noise at SNR ~ U(15, 35) dB — both classes
        snr_db = rng.uniform(15.0, 35.0)
        sig_rms = np.sqrt(np.mean(wave ** 2)) + 1e-9
        noise_rms = sig_rms / (10.0 ** (snr_db / 20.0))
        wave = wave + noise_rms * _pink(rng, len(t))

        # level jitter ±6 dB
        wave *= 10.0 ** (rng.uniform(-6.0, 6.0) / 20.0)

    envelope = np.minimum(1.0, np.minimum(t / 0.05, (dur - t) / 0.05))
    wave = wave * envelope * 0.5
    peak = np.max(np.abs(wave)) + 1e-9
    if peak > 0.99:  # avoid clipping after jitter
        wave = wave * (0.99 / peak)
    return wave.astype(np.float32)


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
    p.add_argument("--hard", action="store_true",
                   help="overlapping-distribution task with attack "
                        "families + noise (EER lands ~3-15%% instead of "
                        "saturating at 0)")
    p.add_argument("--families", default=",".join(HARD_FAMILIES),
                   help="comma list of spoof attack families (hard mode); "
                        "use disjoint sets for train vs eval dirs")
    p.add_argument("--hard_strength", type=float, default=1.0,
                   help="hard-mode spoof artifact strength multiplier; "
                        "calibrate with probe_hardness.py so the task "
                        "lands in a sensitive EER band (neither chance "
                        "nor saturated) for the target encoder")
    p.add_argument("--speaker_offset", type=int, default=0,
                   help="first speaker id (hard mode); offset eval dirs "
                        "for speaker-disjoint evaluation")
    p.add_argument("--session_size", type=int, default=0,
                   help="hard mode: group clips into label-pure recording "
                        "sessions of this size sharing a channel "
                        "fingerprint (EQ + background + level + duration) "
                        "while per-clip artifact strength stays "
                        "independent — makes the benchmark "
                        "retrieval-sensitive (weak queries are "
                        "disambiguated by session-mate neighbors). "
                        "0 = off (per-clip draws, the committed hard-mode "
                        "records)")
    p.add_argument("--session_fp", type=float, default=1.0,
                   help="session-mode fingerprint salience: scales the "
                        "shared channel cues (EQ depth, background "
                        "level) up and the per-clip jitter down. "
                        "Calibrate with probe_sessions.py so top-5 "
                        "neighbor session coherence is high (~0.8) "
                        "without collapsing the artifact signal")
    p.add_argument("--session_anchors", type=int, default=8,
                   help="session-mode fingerprint entropy: EQ anchor "
                        "count per fingerprint (8 = legacy). At ITW "
                        "scale the 8-anchor space crowds (~4k sessions "
                        "-> coherence 0.54@1600 drops to 0.28@31.8k); "
                        "raise for scale-stable session signatures")
    args = p.parse_args()
    if args.session_fp <= 0:
        raise SystemExit("--session_fp must be > 0 (it scales shared-cue "
                         "salience and divides per-clip jitter)")
    if args.session_fp != 1.0 and args.session_size == 0:
        raise SystemExit("--session_fp has no effect without "
                         "--session_size > 0 (session mode)")

    from radad_tpu.data.audio import write_wav

    rng = np.random.default_rng(args.seed)
    families = [f.strip() for f in args.families.split(",") if f.strip()]
    for f in families:
        if f not in HARD_FAMILIES:
            raise SystemExit(f"unknown attack family {f!r}; "
                             f"choose from {HARD_FAMILIES}")
    if args.session_size > 0 and not args.hard:
        raise SystemExit("--session_size requires --hard")
    os.makedirs(args.out, exist_ok=True)
    rows = []
    session_map = {}
    for i in range(args.n):
        if args.session_size > 0:
            # session mode: label / speaker / family / fingerprint are
            # SESSION properties; artifact strength stays per-clip
            sess = i // args.session_size
            spk = args.speaker_offset + (sess % args.speakers)
            if i % args.session_size == 0:
                session = make_session_params(rng, fp=args.session_fp,
                                              anchors=args.session_anchors)
                session["f0"] = (110.0 * (2.0 ** ((spk % 24) / 12.0))
                                 * rng.uniform(0.98, 1.02))
            label = ("spoof" if (sess * args.spoof_ratio) % 1.0
                     + args.spoof_ratio >= 1.0 else "bona-fide")
            family = families[sess % len(families)]
            f0 = session["f0"] * rng.uniform(0.995, 1.005)
            jit = session.get("jitter", 1.0)
            dur = float(np.clip(
                session["dur"] + rng.uniform(-0.3, 0.3) * jit, 1.0, 4.0))
            wave = synth_clip_hard(rng, f0, dur, args.sr,
                                   label == "spoof", family,
                                   strength=args.hard_strength,
                                   session=session)
        else:
            spk = args.speaker_offset + (i % args.speakers)
            f0 = (110.0 * (2.0 ** ((spk % 24) / 12.0))
                  * rng.uniform(0.98, 1.02))
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
            if args.hard:
                family = families[i % len(families)]
                wave = synth_clip_hard(rng, f0, dur, args.sr,
                                       label == "spoof", family,
                                       strength=args.hard_strength)
            else:
                wave = synth_clip(rng, f0, dur, args.sr, label == "spoof")
        fname = f"clip_{i:05d}.wav"
        write_wav(os.path.join(args.out, fname), wave, args.sr)
        rows.append((fname, f"speaker_{spk:02d}", label))
        if args.session_size > 0:
            session_map[fname] = i // args.session_size
    if session_map:
        import json
        with open(os.path.join(args.out, "sessions.json"), "w") as f:
            json.dump(session_map, f)
        # generation provenance: lets probe_sessions report the TRUE
        # parameters of a reused dir instead of whatever was passed
        with open(os.path.join(args.out, "session_params.json"), "w") as f:
            json.dump({"n": args.n, "session_size": args.session_size,
                       "session_fp": args.session_fp,
                       "session_anchors": args.session_anchors,
                       "hard_strength": args.hard_strength,
                       "families": families,
                       "speakers": args.speakers, "seed": args.seed}, f)
    with open(os.path.join(args.out, "meta.csv"), "w") as f:
        f.write("file,speaker,label\n")
        for fname, spk, label in rows:
            f.write(f"{fname},{spk},{label}\n")
    print(f"wrote {args.n} clips + meta.csv under {args.out}")


if __name__ == "__main__":
    main()
