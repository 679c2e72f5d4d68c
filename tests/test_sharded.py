"""Resumable sharded runner: per-partition lineage + counters (north rule).

Covers: full run correctness vs oracle, manifest contents, resume-skips
(no recomputation of completed shards), single-shard recovery after a
simulated crash, and fingerprint invalidation on config change.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

import ray

from relation_extraction_ray.config import KGConfig
from relation_extraction_ray.oracle import run_oracle
from relation_extraction_ray.pipelines.sharded import ShardedKGRunner
from relation_extraction_ray.sources.synth import corpus_table

N_DOCS = 60
N_SHARDS = 4
PER_SHARD = N_DOCS // N_SHARDS


def _mk_docs_for_shard():
    import pyarrow as pa

    import ray.data as rd

    from relation_extraction_ray import schemas
    from relation_extraction_ray.sources.synth import gen_doc

    def docs_for_shard(shard: int):
        def gen(batch: pa.Table) -> pa.Table:
            rows = [gen_doc(i + shard * PER_SHARD)[0] for i in batch.column("id").to_pylist()]
            return pa.Table.from_pylist(rows, schema=schemas.DOCUMENTS)

        return rd.range(PER_SHARD, override_num_blocks=2).map_batches(gen, batch_format="pyarrow")

    return docs_for_shard


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "kgrun")


def _sorted_rows(ds):
    rows = ds.take_all()
    return sorted(rows, key=lambda r: tuple(str(v) for v in r.values()))


def test_full_run_matches_oracle_and_resumes(out_dir, ray_session):
    runner = ShardedKGRunner(out_dir, N_SHARDS, _mk_docs_for_shard())
    out = runner.run()
    assert len(out["recomputed"]) == 2 * N_SHARDS + 2  # sentences + triples per shard, entities + adjacency once

    oracle = run_oracle(corpus_table(N_DOCS).to_pylist())
    got = _sorted_rows(out["adjacency"])
    want = sorted(oracle["adjacency"].to_pylist(), key=lambda r: tuple(str(v) for v in r.values()))
    assert got == want

    # manifest: every (stage, shard) present with counters
    entries = runner.manifest.load()
    assert set(entries) == {(s, i) for s in ("sentences", "triples") for i in range(N_SHARDS)} | {("entities", 0), ("adjacency", 0)}
    for (stage, shard), e in entries.items():
        assert e["status"] == "done" and e["rows"] >= 0
        if stage == "triples":
            assert e["good"] + e["bad"] == e["candidates"]

    # resume: nothing recomputes, outputs identical (worker-written shard
    # fragments are untouched — check every file's mtime)
    import glob

    mtimes = {
        p: os.path.getmtime(p) for p in glob.glob(os.path.join(out_dir, "triples", "*", "*.parquet"))
    }
    assert mtimes
    runner2 = ShardedKGRunner(out_dir, N_SHARDS, _mk_docs_for_shard())
    out2 = runner2.run()
    assert out2["recomputed"] == []
    for p, m in mtimes.items():
        assert os.path.getmtime(p) == m
    assert _sorted_rows(out2["adjacency"]) == got


def test_crashed_shard_recovers_alone(out_dir, ray_session):
    runner = ShardedKGRunner(out_dir, N_SHARDS, _mk_docs_for_shard())
    baseline = _sorted_rows(runner.run()["adjacency"])

    # simulate a crash that lost shard 2's triples output + manifest entry
    shutil.rmtree(os.path.join(out_dir, "triples", "shard=2"))
    entries = [
        e
        for e in map(json.loads, open(runner.manifest.path).read().splitlines())
        if not (e["stage"] == "triples" and e["shard"] == 2)
    ]
    with open(runner.manifest.path, "w") as f:
        f.writelines(json.dumps(e) + "\n" for e in entries)

    runner3 = ShardedKGRunner(out_dir, N_SHARDS, _mk_docs_for_shard())
    out3 = runner3.run()
    assert out3["recomputed"] == [("triples", 2)]  # only the lost shard
    assert _sorted_rows(out3["adjacency"]) == baseline


def test_lost_file_with_intact_manifest_recomputes(out_dir, ray_session):
    """A manifest entry that outlives its parquet (partial disk loss) must
    NOT be trusted — silent row-undercount was a real bug caught by probe."""
    import glob

    runner = ShardedKGRunner(out_dir, N_SHARDS, _mk_docs_for_shard())
    baseline = _sorted_rows(runner.run()["adjacency"])
    os.remove(glob.glob(os.path.join(out_dir, "triples", "shard=1", "*.parquet"))[0])
    runner2 = ShardedKGRunner(out_dir, N_SHARDS, _mk_docs_for_shard())
    out2 = runner2.run()
    assert out2["recomputed"] == [("triples", 1)]
    assert _sorted_rows(out2["adjacency"]) == baseline


def test_partial_sidestream_idempotent(tmp_path):
    """A retried task re-writing the same content key folds exactly once;
    distinct keys fold additively (the CounterActor replacement must keep
    its idempotent-retry semantics)."""
    import pyarrow as pa

    from relation_extraction_ray.state.lineage import fold_partial_scalars, write_partial

    d = str(tmp_path / "audit")
    t = pa.Table.from_pydict({"n": pa.array([], pa.int64())})
    write_partial(t, d, "k1", {"sum:good": 3, "xor:span": 0b1010})
    write_partial(t, d, "k1", {"sum:good": 3, "xor:span": 0b1010})  # retry: same key
    write_partial(t, d, "k2", {"sum:good": 2, "xor:span": 0b0110})
    folded = fold_partial_scalars(d)
    assert folded == {"good": 5, "span": 0b1100}


def test_lost_count_partials_recompute_sentences(out_dir, ray_session):
    """The count side-stream is lineage too: a sentences manifest entry
    whose partial fragments were lost (or truncated) must recompute, not
    silently under-count the vocab."""
    import glob

    runner = ShardedKGRunner(out_dir, N_SHARDS, _mk_docs_for_shard())
    baseline = _sorted_rows(runner.run()["adjacency"])
    os.remove(glob.glob(os.path.join(out_dir, "counts", "shard=3", "part-*.parquet"))[0])
    runner2 = ShardedKGRunner(out_dir, N_SHARDS, _mk_docs_for_shard())
    out2 = runner2.run()
    assert ("sentences", 3) in out2["recomputed"]
    assert _sorted_rows(out2["adjacency"]) == baseline


def test_config_change_invalidates_resume(out_dir, ray_session):
    runner = ShardedKGRunner(out_dir, 2, _mk_docs_for_shard())
    runner.run()
    changed = ShardedKGRunner(out_dir, 2, _mk_docs_for_shard(), cfg=KGConfig(max_len=5))
    changed.run()
    assert len(changed.recomputed) == 6  # different fingerprint -> full recompute (incl. derived tables)


def test_worker_kill_mid_shard_is_retried_exactly(out_dir, ray_session, tmp_path):
    """Round-4 verdict #6: a REAL worker-process death (``os._exit``, no
    Python-level unwinding) mid-shard must leave the final
    triples/entities/adjacency byte-identical to a clean run and every
    folded lineage counter exact — proving the idempotent content-keyed
    side-stream fragments under an actual kill, not a raised exception.
    The kill fires after earlier batches on the same worker already wrote
    their count partials, so the retry re-writes overlapping fragments."""
    marker = str(tmp_path / "kill.marker")
    base = _mk_docs_for_shard()

    def faulty(shard: int):
        ds = base(shard)
        if shard != 1:
            return ds

        def kill_once(batch):
            try:
                fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return batch  # already killed once — let the retry through
            os.write(fd, b"x")
            os.close(fd)
            os._exit(1)  # hard kill of this worker process

        return ds.map_batches(kill_once, batch_format="pyarrow")

    clean = ShardedKGRunner(out_dir + "_clean", N_SHARDS, base).run()
    killed = ShardedKGRunner(out_dir, N_SHARDS, faulty).run()
    assert os.path.exists(marker), "the injected worker kill never fired"

    for name in ("triples", "entities", "adjacency"):
        assert _sorted_rows(killed[name]) == _sorted_rows(clean[name]), name

    # lineage: every manifest entry (rows, sentence/audit counters, span
    # checksums, fingerprints) identical to the clean run's
    clean_m = ShardedKGRunner(out_dir + "_clean", N_SHARDS, base).manifest.load()
    killed_m = ShardedKGRunner(out_dir, N_SHARDS, base).manifest.load()
    assert clean_m == killed_m
