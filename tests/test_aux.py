"""Aux subsystems: registry, TSV datasets, profiling, summaries, distributed."""
import json
import os

import numpy as np
import pytest

from rlaifv_tpu.core.distributed import all_gather_objects, barrier, is_primary
from rlaifv_tpu.core.registry import Registry
from rlaifv_tpu.data.tsv_data import (
    MultiDataSourceDataset,
    SingleDataSourceDataset,
    TSVFile,
    chunked_random_indices,
)
from rlaifv_tpu.evals.summaries import chair_summary, collect_obj_halbench_reviews
from rlaifv_tpu.utils.profiling import StepTimer, annotate, trace


def test_registry():
    r = Registry("test")

    @r.register("a")
    def fn_a():
        return 1

    assert r["a"]() == 1
    assert "a" in r
    with pytest.raises(KeyError):
        r["missing"]
    with pytest.raises(KeyError):
        r.register("a")(fn_a)


def _write_tsv(path, rows):
    with open(path, "w") as f:
        for row in rows:
            f.write("\t".join(row) + "\n")


def test_tsv_file_seek(tmp_path):
    p = str(tmp_path / "data.tsv")
    _write_tsv(p, [["a", "1"], ["b", "2"], ["c", "3"]])
    t = TSVFile(p)
    assert len(t) == 3
    assert t[1] == ["b", "2"]
    assert t[0] == ["a", "1"]  # seek backwards works
    assert os.path.exists(str(tmp_path / "data.lineidx"))


def test_single_source_shards(tmp_path):
    p1, p2 = str(tmp_path / "s1.tsv"), str(tmp_path / "s2.tsv")
    _write_tsv(p1, [["r0"], ["r1"]])
    _write_tsv(p2, [["r2"], ["r3"], ["r4"]])
    ds = SingleDataSourceDataset("src", p1, p2)
    assert len(ds) == 5
    assert ds[1] == ["r1"] and ds[2] == ["r2"] and ds[4] == ["r4"]


def test_multi_source_interleave(tmp_path):
    pa, pb = str(tmp_path / "a.tsv"), str(tmp_path / "b.tsv")
    _write_tsv(pa, [[f"a{i}"] for i in range(6)])
    _write_tsv(pb, [[f"b{i}"] for i in range(3)])
    a = SingleDataSourceDataset("a", pa)
    b = SingleDataSourceDataset("b", pb)
    ds = MultiDataSourceDataset([a, b], [2, 1])
    rows = [ds[i][0] for i in range(len(ds))]
    # pattern aabaab...: both sources in order, 2:1 ratio
    assert rows == ["a0", "a1", "b0", "a2", "a3", "b1", "a4", "a5", "b2"]


def test_chunked_random_indices():
    idx = chunked_random_indices(25, chunk_size=10, seed=0)
    assert sorted(idx) == list(range(25))
    # within-chunk shuffling only
    assert set(idx[:10]) == set(range(10))
    assert set(idx[20:]) == set(range(20, 25))


def test_step_timer():
    t = StepTimer()
    assert t.tick() is None
    assert t.tick() is not None
    assert t.throughput(4) > 0


def test_trace_noop_and_annotate(tmp_path):
    with trace(None):
        pass
    with annotate("region"):
        x = np.ones(3).sum()
    assert x == 3


def test_distributed_single_process():
    assert is_primary()
    assert all_gather_objects({"a": 1}) == [{"a": 1}]
    barrier()  # no-op


def test_chair_summary_formulas():
    metrics = {
        "CHAIRs_refine": 0.2, "CHAIRi": 0.1, "correct_rate": 0.8,
        "object_correct_rate": 0.9, "obj_rec": 0.5,
        "coco_sentence_num": 300, "coco_word_count": 100,
        "gt_word_count": 200, "avg_word_len": 60.0,
    }
    s = chair_summary(metrics)
    assert s["response_hall"] == 20.0
    assert abs(s["object_f1"] - (2 * 50 * 90 / 140)) < 1e-9


def test_collect_reviews(tmp_path):
    # reference layout: {model}/{anything}/checkpoint-{step}/{file}
    d = tmp_path / "model-x" / "eval" / "checkpoint-167"
    os.makedirs(d)
    with open(d / "hall_obj_halbench_x.json", "w") as f:
        json.dump({"overall_metrics": {"CHAIRs_refine": 0.1}}, f)
    out = collect_obj_halbench_reviews(str(tmp_path) + "/")
    assert out
    model = list(out)[0]
    assert 167 in out[model]


def test_assert_consistent_detects_divergence(monkeypatch):
    """RLAIFV_DISTRIBUTED_DEBUG guard: no-op single process / flag off;
    raises with per-process detail on divergent host state."""
    from rlaifv_tpu.core import distributed as dist

    dist.assert_consistent({"seed": 1}, "cfg")  # single-process no-op

    monkeypatch.setattr(dist.jax, "process_count", lambda: 2)
    dist.assert_consistent({"seed": 1}, "cfg")  # flag off -> no-op

    monkeypatch.setenv("RLAIFV_DISTRIBUTED_DEBUG", "1")
    monkeypatch.setattr(
        dist, "all_gather_objects", lambda blob: [blob, blob]
    )
    dist.assert_consistent({"seed": 1}, "cfg")  # consistent -> ok

    monkeypatch.setattr(
        dist, "all_gather_objects",
        lambda blob: [blob, blob.replace("1", "2")],
    )
    import pytest as _pytest
    with _pytest.raises(AssertionError, match="differs across processes"):
        dist.assert_consistent({"seed": 1}, "cfg")
