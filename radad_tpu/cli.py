"""Command-line entry point: train / evaluate / predict.

Counterpart of the reference's ``main.py`` with the same flag surface
(``/root/reference/main.py:18-35``): ``--mode {train,evaluate,predict}``,
``--data_fraction``, ``--model_prefix``, ``--audio_path``,
``--feature_extractor``, ``--wandb`` — plus ``--data_path``/``--data_root``
(the reference hardcodes Colab paths, config.py:23-26) and TPU-specific
``--batch_size``/``--epochs``/``--index_type`` overrides.

Conscious fixes of reference bugs, preserved behavior otherwise:
  * predict prints P(spoof) AND P(bona-fide) — the reference crashes with a
    KeyError reading ``probability_bonafide`` (main.py:100 vs
    pipeline.py:1098);
  * predict loads ``best_model`` with a fallback to ``final_model`` — the
    reference expects best_model but never writes it (main.py:96); our
    trainer writes both.

Run: ``python -m radad_tpu.cli --mode train --data_path <dir>``.
"""

from __future__ import annotations

import argparse
import logging
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Audio Deepfake Detection (TPU)")
    p.add_argument("--mode", type=str, required=True,
                   choices=["train", "evaluate", "predict", "build_db"],
                   help="Operation mode (build_db: build or incrementally "
                        "extend the vector DB from the training split "
                        "without training — the reference can only build "
                        "its index inside train, pipeline.py:416-447)")
    p.add_argument("--data_fraction", type=float, default=1.0,
                   help="Fraction of data to use (class-balanced subsample)")
    p.add_argument("--model_prefix", type=str, default="final_model",
                   help="Prefix for saved model files")
    p.add_argument("--audio_path", type=str, default=None,
                   help="Audio file for predict mode")
    p.add_argument("--max_duration", type=float, default=None,
                   help="Analyze up to this many seconds per clip instead "
                        "of the reference's hard 3 s truncation. In "
                        "train/evaluate modes this enables the long-audio "
                        "pipeline (valid-window-masked TPP mean); in "
                        "predict mode it applies per call.")
    p.add_argument("--feature_extractor", type=str, default="wav2vec2",
                   help="whisper, wavlm, wav2vec2, or hubert")
    p.add_argument("--model_name", type=str, default=None,
                   help="HF model id overriding the encoder family's "
                        "default size (reference names its checkpoints in "
                        "config.py:42-45; e.g. facebook/wav2vec2-large-lv60, "
                        "microsoft/wavlm-large, openai/whisper-small). "
                        "Architecture resolves from the preset table or a "
                        "local config.json (models/encoder.py); weights "
                        "load when a local checkpoint exists under "
                        "--weights_dir")
    p.add_argument("--whisper_fast", action="store_true",
                   help="whisper: encode only the real frames instead of "
                        "padding every segment to 30 s (the reference pads "
                        "to 30 s, feature_extractor.py:94-113 — that parity "
                        "mode stays the default; this is the TPU-fast "
                        "variant, quality delta quantified in "
                        "experiments/README.md)")
    p.add_argument("--nprobe", type=int, default=None,
                   help="IVF cells probed per search (reference "
                        "config.py:53/76 vector_db_nprobe)")
    p.add_argument("--wandb", action="store_true",
                   help="Enable Weights & Biases logging")
    p.add_argument("--data_path", type=str, default=None,
                   help="Directory containing meta.csv + audio files")
    p.add_argument("--data_root", type=str, default=None,
                   help="Output root for models/metrics/index")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--eval_batch_size", type=int, default=256)
    p.add_argument("--db_batch_size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--top_k", type=int, default=None)
    p.add_argument("--index_type", type=str, default=None,
                   help="L2, IP, COSINE, or IVF")
    p.add_argument("--ivf_balance", type=float, default=None,
                   help="IVF centroid split-refinement strength (0 = plain "
                        "Lloyd = FAISS parity; ~1.0 balances cell sizes "
                        "for lower gather-probed serving latency)")
    p.add_argument("--ivf_no_retrain_on_add", action="store_true",
                   help="IVF: never retrain the coarse quantizer on "
                        "append — assign new rows to the existing cells "
                        "(FAISS IndexIVFFlat.add parity; pairs with "
                        "--mode build_db incremental ingestion)")
    p.add_argument("--sq8_residual_nlist", type=int, default=None,
                   help="SQ8 residual-encoding codebook size (0 = plain "
                        "per-row SQ8; ~1024 recovers recall on clustered "
                        "embeddings at unchanged scan cost)")
    p.add_argument("--sq8_refine_bits", type=int, default=None,
                   choices=[0, 4],
                   help="int4 refinement level for SQ8 (+0.5 B/dim → "
                        "~12-bit rerank/neighbor fidelity; capacity-mode "
                        "recall fix, single-chip)")
    p.add_argument("--weights_dir", type=str, default=None,
                   help="Directory with local HF checkpoints for encoders")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--data_shards", type=int, default=0,
                   help="mesh 'data' axis size (0 = single device)")
    p.add_argument("--index_shards", type=int, default=1,
                   help="mesh 'index' axis size (DB row sharding)")
    p.add_argument("--no_cache_embeddings", action="store_true",
                   help="recompute encoder features every epoch "
                        "(reference behavior; default caches them)")
    p.add_argument("--use_float16", action="store_true",
                   help="store the vector DB in bf16 (FAISS fp16 analogue)")
    p.add_argument("--mixed_precision", action="store_true",
                   help="encoder forward in bfloat16 — the reference's AMP "
                        "flag (config.py:73-87); measured 1.69x encoder "
                        "throughput on v5e with quality tracking f32 on the "
                        "synthetic benchmark (experiments/README.md)")
    p.add_argument("--rebuild_db", action="store_true",
                   help="build_db mode: discard any saved index and "
                        "re-embed everything (default appends only clips "
                        "not already indexed)")
    p.add_argument("--resume", action="store_true",
                   help="train mode: resume from the final_model checkpoint "
                        "(params + optimizer state + step; the reference "
                        "cannot resume — its checkpoints are bare "
                        "state_dicts, pipeline.py:1112-1134)")
    return p


def config_from_args(args) -> "Config":
    from radad_tpu.config import Config

    cfg = Config()
    over = dict(
        data_fraction=args.data_fraction,
        feature_extractor_type=args.feature_extractor.lower(),
        usewandb=bool(args.wandb),
        batch_size=args.batch_size,
        eval_batch_size=args.eval_batch_size,
        db_batch_size=args.db_batch_size,
        # main.py:65-66 forces LayerNorm over BatchNorm for all runs
        use_batch_norm=False,
        use_layer_norm=True,
        cache_embeddings=not args.no_cache_embeddings,
        use_float16=args.use_float16,
        use_mixed_precision=args.mixed_precision,
    )
    if args.data_path:
        over.update(train_data_path=args.data_path,
                    test_data_path=args.data_path)
    if args.data_root:
        import os

        over.update(data_root=args.data_root,
                    vector_db_path=os.path.join(args.data_root, "vector_db"))
    if args.epochs is not None:
        over["num_epochs"] = args.epochs
    if args.top_k is not None:
        over["top_k"] = args.top_k
    if args.model_name is not None:
        fam = args.feature_extractor.lower()
        over[f"{fam}_model_name"] = args.model_name
    if args.whisper_fast:
        over["whisper_pad_seconds"] = None
    if args.nprobe is not None:
        over["vector_db_nprobe"] = args.nprobe
    if args.index_type is not None:
        over["vector_db_index_type"] = args.index_type.upper()
    if args.ivf_balance is not None:
        over["vector_db_ivf_balance"] = args.ivf_balance
    if args.ivf_no_retrain_on_add:
        over["vector_db_ivf_retrain_on_add"] = False
    if args.sq8_residual_nlist is not None:
        over["sq8_residual_nlist"] = args.sq8_residual_nlist
    if args.sq8_refine_bits is not None:
        over["sq8_refine_bits"] = args.sq8_refine_bits
    if args.seed is not None:
        over["random_seed"] = args.seed
    if args.max_duration is not None and args.mode != "predict":
        # Long-audio mode for train/evaluate: lift the reference's hard 3 s
        # truncation (dataset.py:143); see Config.max_duration. In predict
        # mode the flag stays a per-call argument (no config change).
        over["max_duration"] = args.max_duration
    return cfg.replace(**over)


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)

    import jax

    logging.info("JAX devices: %s", jax.devices())

    from radad_tpu.data.manifest import load_manifests
    from radad_tpu.models.encoder import build_encoder
    from radad_tpu.train.pipeline import (DetectionPipeline,
                                          print_dataset_statistics)

    mesh = None
    if args.data_shards:
        from radad_tpu.parallel import make_mesh

        mesh = make_mesh(data=args.data_shards, index=args.index_shards)
        logging.info("mesh: %s", dict(mesh.shape))

    encoder = build_encoder(cfg, weights_dir=args.weights_dir)
    pipeline = DetectionPipeline(cfg, encoder=encoder, mesh=mesh)

    if args.mode == "train":
        splits = load_manifests(
            cfg.train_data_path, data_fraction=cfg.data_fraction,
            train_split=cfg.train_split, seed=cfg.random_seed)
        print_dataset_statistics(splits)
        if args.resume:
            if pipeline.load_models(args.model_prefix):
                pipeline.load_vector_database()
                logging.info("resumed from %s at step %d",
                             args.model_prefix, pipeline.step)
            else:
                logging.warning("--resume: no checkpoint found, "
                                "training from scratch")
        pipeline.train(splits["train"], splits["val"])

    elif args.mode == "evaluate":
        if not pipeline.load_models(args.model_prefix):
            return 1
        if not pipeline.load_vector_database():
            return 1
        splits = load_manifests(
            cfg.test_data_path, data_fraction=cfg.data_fraction,
            train_split=cfg.train_split, seed=cfg.random_seed)
        results = pipeline.evaluate(splits["val"])
        print("Evaluation metrics:")
        for key, value in results.items():
            print(f"{key}: {value}")

    elif args.mode == "build_db":
        splits = load_manifests(
            cfg.train_data_path, data_fraction=cfg.data_fraction,
            train_split=cfg.train_split, seed=cfg.random_seed)
        added = pipeline.update_vector_database(
            splits["train"], append=not args.rebuild_db)
        print(f"Vector DB: {pipeline.index.ntotal} vectors "
              f"({added} added this run)")

    elif args.mode == "predict":
        if not args.audio_path:
            raise ValueError("Audio path must be provided for predict mode")
        prefix = args.model_prefix if args.model_prefix != "final_model" \
            else "best_model"
        if not pipeline.load_models(prefix):
            logging.info("falling back to final_model checkpoint")
            if not pipeline.load_models("final_model"):
                return 1
        if not pipeline.load_vector_database():
            return 1
        result = pipeline.predict(args.audio_path,
                                  max_duration=args.max_duration)
        logging.info("Prediction  : %s", result["prediction"])
        logging.info("Probability(spoof)     : %.4f",
                     result["probability_spoof"])
        logging.info("Probability(bona-fide) : %.4f",
                     1.0 - result["probability_spoof"])
        logging.info("Retrieved   : %s", result["retrieved_labels"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
