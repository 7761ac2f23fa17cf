"""Incremental vector-DB build/update (``--mode build_db``).

The reference can only (re)build its FAISS index lazily inside ``train``
(``/root/reference/pipeline.py:416-447,786-789``); this framework adds a
standalone build/append mode so a serving deployment can ingest newly
vetted reference clips without re-embedding the corpus or re-training.
"""

import os

import numpy as np
import pytest

from tests.test_cli_serve import monkeypatch_encoder  # noqa: F401 (fixture)


def _make_pipeline(synthetic_dataset, root, encoder, **over):
    from radad_tpu.config import Config
    from radad_tpu.train.pipeline import DetectionPipeline

    cfg = Config().replace(
        train_data_path=synthetic_dataset, test_data_path=synthetic_dataset,
        data_root=root, vector_db_path=os.path.join(root, "vector_db"),
        db_batch_size=8, use_batch_norm=False, use_layer_norm=True, **over)
    return DetectionPipeline(cfg, encoder=encoder)


def test_update_vector_database_appends_only_new(
        synthetic_dataset, tmp_path, monkeypatch_encoder):  # noqa: F811
    from radad_tpu.data.manifest import load_manifests
    from radad_tpu.index.flat import FlatIndex

    root = str(tmp_path)
    pipe = _make_pipeline(synthetic_dataset, root, monkeypatch_encoder)
    splits = load_manifests(synthetic_dataset, data_fraction=1.0,
                            train_split=0.8, seed=42)
    full = splits["train"]
    n = len(full)
    assert n >= 8
    first = full.subset(range(n - 4))

    added = pipe.update_vector_database(first)
    assert added == len(first)
    assert pipe.index.ntotal == len(first)
    base_vectors = np.asarray(pipe.index.vectors)[: len(first)].copy()

    # Idempotent: nothing new -> nothing embedded, nothing added.
    assert pipe.update_vector_database(first) == 0

    # A grown manifest appends ONLY the unseen clips, preserving existing
    # rows (and their embeddings) in place.
    added = pipe.update_vector_database(full)
    assert added == 4
    assert pipe.index.ntotal == n
    assert list(pipe.index.paths[: len(first)]) == list(first.paths)
    new_paths = set(full.paths) - set(first.paths)
    assert set(pipe.index.paths[len(first):]) == new_paths
    np.testing.assert_array_equal(
        np.asarray(pipe.index.vectors)[: len(first)], base_vectors)

    # The appended index round-trips through persistence.
    loaded = FlatIndex.load(os.path.join(root, "vector_db"))
    assert loaded.ntotal == n
    assert list(loaded.paths) == list(pipe.index.paths)

    # append=False rebuilds from scratch.
    assert pipe.update_vector_database(first, append=False) == len(first)
    assert pipe.index.ntotal == len(first)


def test_update_vector_database_loads_saved_index(
        synthetic_dataset, tmp_path, monkeypatch_encoder):  # noqa: F811
    """A fresh process appends against the SAVED index (no retrain)."""
    from radad_tpu.data.manifest import load_manifests

    root = str(tmp_path)
    splits = load_manifests(synthetic_dataset, data_fraction=1.0,
                            train_split=0.8, seed=42)
    full = splits["train"]
    first = full.subset(range(len(full) - 3))

    pipe1 = _make_pipeline(synthetic_dataset, root, monkeypatch_encoder)
    pipe1.update_vector_database(first)

    pipe2 = _make_pipeline(synthetic_dataset, root, monkeypatch_encoder)
    assert pipe2.index.ntotal == 0
    added = pipe2.update_vector_database(full)
    assert added == 3
    assert pipe2.index.ntotal == len(full)


def test_cli_build_db_incremental(synthetic_dataset, tmp_path, capsys,
                                  monkeypatch_encoder):  # noqa: F811
    from radad_tpu import cli

    root = str(tmp_path / "cli_db_root")
    args = ["--mode", "build_db", "--data_path", synthetic_dataset,
            "--data_root", root, "--db_batch_size", "8"]
    assert cli.main(args) == 0
    out1 = capsys.readouterr().out
    assert "added this run" in out1

    # Second run: everything already indexed.
    assert cli.main(args) == 0
    out2 = capsys.readouterr().out
    assert "(0 added this run)" in out2

    # --rebuild_db re-embeds from scratch (same final count here).
    assert cli.main(args + ["--rebuild_db"]) == 0
    out3 = capsys.readouterr().out
    assert "added this run" in out3
    assert "(0 added" not in out3
