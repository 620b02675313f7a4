"""Log-structured metadata guarantees (no Spark needed — pure driver):
flat commit cost in table age, crash recovery from a torn commit, CAS
single-winner, time travel, log expiry."""

import time

import pytest

from cityofphiladelphia_databridge_etl_tools_spark.lake.fs import InMemoryObjectStore
from cityofphiladelphia_databridge_etl_tools_spark.lake.manifest import (
    CommitRecord,
    ConcurrentCommitError,
    LogDelta,
    Manifest,
    MetaStore,
    SchemaVersion,
)


@pytest.fixture(params=["local", "object_store"])
def mk_store(request, tmp_path):
    """Every metadata test runs twice: once on POSIX (LocalFS), once on
    the conditional-PUT object-store double — proving the FileSystem
    seam is real (an S3/GCS impl only maps these six calls to HTTP)."""
    if request.param == "local":
        def mk(**kw):
            return MetaStore(str(tmp_path / "t"), **kw)
    else:
        shared = InMemoryObjectStore()  # one "bucket" shared by all writers

        def mk(**kw):
            return MetaStore("mem://bucket/t", fs=shared, **kw)
    return mk


def snap_bytes(store, version):
    return len(store.fs.read_text(store.snapshot_path(version)))


def base_manifest(n_buckets=8):
    return Manifest(
        version=0,
        n_buckets=n_buckets,
        key_columns=["k"],
        order_columns=["ts", "lsn"],
        schema_versions=[SchemaVersion(0, "{}", 0.0)],
        bucket_files={},
        commits=[],
        watermarks={},
    )


def make_delta(v, n_entries=8):
    return LogDelta(
        version=v,
        new_commits=[
            CommitRecord(f"b{v}", v * 10, v * 10 + 9, 100, 100, 100, 0, [v % 8], 0.0)
        ],
        bucket_appends={
            str(v % 8): [
                [f"data/s{v:06d}/f{i}.parquet", 0, "delta", v * 10, v * 10 + 9]
                for i in range(n_entries)
            ]
        },
        watermark_updates={str(v % 8): v * 10 + 9},
    )


def test_commit_cost_flat_in_table_age(mk_store):
    """The round-1 design serialized the FULL state per commit —
    O(files+commits), linear decay with table age. The log design
    serializes only the diff: the 450th commit must cost about the
    same as the 5th (snapshot commits amortize at 1/interval)."""
    store = mk_store()
    store.commit(base_manifest())
    m = store.read_current()
    times = []
    for v in range(1, 501):
        t0 = time.perf_counter()
        m = store.commit_delta(m, make_delta(v))
        times.append(time.perf_counter() - t0)
    n_entries = sum(len(e) for e in m.bucket_files.values())
    assert n_entries == 500 * 8  # state really grew 500 commits worth
    assert len(m.applied_ids) == 500
    med = lambda xs: sorted(xs)[len(xs) // 2]
    early, late = med(times[:50]), med(times[-50:])
    # generous 5x bound for box noise; the old design measured >40x here
    assert late < early * 5, f"commit cost grew with table age: {early} -> {late}"


def test_crash_after_delta_before_hint_recovers(mk_store):
    """The delta record IS the commit: a writer that died after
    creating delta-N but before updating the CURRENT hint loses
    nothing, and no wedge state exists (the round-1 pointer-flip
    design wedged here)."""
    store = mk_store()
    store.commit(base_manifest())
    m = store.read_current()
    for v in (1, 2):
        m = store.commit_delta(m, make_delta(v))
    # torn commit: delta-3 lands, the hint write never happens
    assert store.fs.create_exclusive(store.delta_path(3), make_delta(3).to_json())
    assert store.fs.read_text(store.current_path).strip() == "2"  # hint lags

    fresh = mk_store()  # new process, cold cache
    got = fresh.read_current()
    assert got.version == 3
    assert "b3" in got.applied_batch_ids  # the torn commit is visible
    # replaying b3's position loses the CAS — no infinite-retry wedge
    with pytest.raises(ConcurrentCommitError):
        two = mk_store()
        two._cache = m.copy()  # stale view at version 2, as the crashed writer's retry would have
        two.commit_delta(m, make_delta(3))
    # and the standard recovery (reload, next position) succeeds
    fresh.commit_delta(got, make_delta(4))
    assert fresh.read_current().version == 4


def test_cas_exactly_one_winner(mk_store):
    store_a = mk_store()
    store_a.commit(base_manifest())
    store_b = mk_store()
    ma, mb = store_a.read_current(), store_b.read_current()
    store_a.commit_delta(ma, make_delta(1))
    with pytest.raises(ConcurrentCommitError):
        store_b.commit_delta(mb, make_delta(1))
    # loser reloads (sees the winner) and lands at the next position
    mb2 = store_b.read_current()
    assert "b1" in mb2.applied_batch_ids
    store_b.commit_delta(mb2, make_delta(2))
    assert store_a.read_current().version == 2


def test_time_travel_and_expire_log(mk_store):
    store = mk_store(snapshot_interval=16)
    store.commit(base_manifest())
    m = store.read_current()
    for v in range(1, 41):
        m = store.commit_delta(m, make_delta(v, n_entries=2))
    # snapshots at 0, 16, 32; deltas 0..40
    assert store._snapshot_versions() == [0, 16, 32]
    at_20 = store.read_version(20)
    assert at_20.version == 20 and len(at_20.applied_ids) == 20
    removed = store.expire_log(keep_snapshots=2)  # horizon = snapshot 16
    assert removed and all(
        int(p.rsplit("-", 1)[1][:9]) < 16 for p in removed
    )
    # current state and post-horizon travel unaffected
    fresh = mk_store()
    assert fresh.read_current().version == 40
    assert fresh.read_version(20).version == 20
    with pytest.raises(FileNotFoundError):
        fresh.read_version(10)  # behind the horizon


def test_reader_mutation_cannot_corrupt_cache(mk_store):
    store = mk_store()
    store.commit(base_manifest())
    m = store.commit_delta(store.read_current(), make_delta(1))
    m.version = 999  # hostile caller
    m.bucket_files.clear()
    again = store.read_current()
    assert again.version == 1 and again.bucket_files


def lsn_delta(v, lo, hi):
    return LogDelta(
        version=v,
        new_commits=[CommitRecord(f"lsn-{lo}-{hi}", lo, hi - 1, 10, 10, 10, 0, [0], 0.0)],
        bucket_appends={"0": [[f"data/s{v:06d}/f.parquet", 0, "delta", lo, hi - 1]]},
        watermark_updates={"0": hi - 1},
    )


def test_lsn_windows_tracked_structurally_and_ids_bounded(mk_store):
    """lsn-window batch ids keep exactly-once over UNBOUNDED table age
    through the contiguous-prefix cursor + out-of-order tail, while
    arbitrary ids use the bounded recent window — so the manifest never
    accumulates one string per commit forever."""
    store = mk_store(id_retention=5)
    store.commit(base_manifest())
    m = store.read_current()
    # out-of-order pipelined commits: 0-10 committed, 20-30 committed,
    # 10-20 is the crash gap
    m = store.commit_delta(m, lsn_delta(1, 0, 10))
    m = store.commit_delta(m, lsn_delta(2, 20, 30))
    assert m.lsn_contig_hi == 10
    assert m.lsn_pending == [[20, 30]]
    applied = m.applied_batch_ids
    assert "lsn-0-10" in applied and "lsn-20-30" in applied
    assert "lsn-10-20" not in applied
    # the gap fills -> prefix extends over the pending tail
    m = store.commit_delta(m, lsn_delta(3, 10, 20))
    assert m.lsn_contig_hi == 30 and m.lsn_pending == []
    # arbitrary ids: bounded retention window (id_retention=5)
    for v in range(4, 14):
        m = store.commit_delta(m, make_delta(v))
    assert len(m.applied_ids) == 5
    assert "b13" in m.applied_batch_ids      # recent: detected
    assert "b4" not in m.applied_batch_ids   # aged out of the window
    # lsn ids survive aging: structural, not list-membership
    assert "lsn-0-10" in m.applied_batch_ids
    # cold reload reconstructs the cursor from the log/snapshot
    fresh = mk_store(id_retention=5)
    fm = fresh.read_current()
    assert fm.lsn_contig_hi == 30 and "lsn-20-30" in fm.applied_batch_ids


def test_snapshot_size_and_cold_read_flat_in_commit_count(mk_store):
    """With constant live-file state, snapshot bytes and cold
    read_current() latency must be FLAT in total commits: bounded
    applied_ids/commits plus structure-shared bucket_files mean no
    O(total-commits) residue accumulates in the materialized state."""
    store = mk_store(snapshot_interval=32, commit_retention=50, id_retention=100)
    store.commit(base_manifest())
    m = store.read_current()

    def replace_delta(v):
        return LogDelta(
            version=v,
            new_commits=[CommitRecord(f"b{v}", v, v, 10, 10, 10, 0, [0], 0.0)],
            bucket_replaces={
                "0": [[f"data/s{v:06d}/f{i}.parquet", 0, "base", v, v] for i in range(8)]
            },
            watermark_updates={"0": v},
        )

    sizes = {}
    for v in range(1, 1201):
        m = store.commit_delta(m, replace_delta(v))
        if v in (96, 1184):  # both are snapshot versions (32*k)
            sizes[v] = snap_bytes(store, v)
    assert sizes[1184] < sizes[96] * 1.5, f"snapshot grew with age: {sizes}"

    def cold_read():
        s2 = mk_store(commit_retention=50, id_retention=100)
        t0 = time.perf_counter()
        s2.read_current()
        return time.perf_counter() - t0

    t_late = min(cold_read() for _ in range(3))
    assert t_late < 0.5, f"cold read_current too slow at 1200 commits: {t_late}"


def test_fold_lsn_windows_property_matches_set_oracle():
    """Property: committing contiguous windows in ANY order keeps the
    structural cursor equal to an oracle that tracks the full set —
    contig_hi is the end of the longest committed prefix, pending is
    exactly the committed windows beyond the first gap, and membership
    agrees with set membership for every window."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cityofphiladelphia_databridge_etl_tools_spark.lake.manifest import (
        Manifest, SchemaVersion, _fold_lsn_windows,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=10),
        st.randoms(use_true_random=False),
    )
    def check(sizes, rng):
        bounds = [0]
        for sz in sizes:
            bounds.append(bounds[-1] + sz)
        windows = list(zip(bounds, bounds[1:]))
        order = windows[:]
        rng.shuffle(order)

        contig, pending = 0, []
        committed: set = set()
        for lo, hi in order:
            contig, pending = _fold_lsn_windows(contig, pending, [f"lsn-{lo}-{hi}"])
            committed.add((lo, hi))
            # oracle: longest committed prefix
            expect_contig = 0
            for wlo, whi in windows:
                if (wlo, whi) in committed and wlo == expect_contig:
                    expect_contig = whi
                else:
                    break
            assert contig == expect_contig, (order, committed, contig, expect_contig)
            assert pending == sorted(
                [list(w) for w in committed if w[0] > expect_contig]
            ), (order, committed, pending)
            # membership view agrees with the set
            m = Manifest(
                version=0, n_buckets=1, key_columns=["k"], order_columns=["lsn"],
                schema_versions=[SchemaVersion(0, "{}", 0.0)], bucket_files={},
                commits=[], watermarks={}, lsn_contig_hi=contig, lsn_pending=pending,
            )
            view = m.applied_batch_ids
            for wlo, whi in windows:
                assert ((f"lsn-{wlo}-{whi}" in view) == ((wlo, whi) in committed))

    check()


def test_persisted_id_retention_wins_over_handle(mk_store):
    """ADVICE r4: the exactly-once window persisted in the manifest
    governs applied_ids truncation for EVERY handle, regardless of
    each handle's ctor-level id_retention — two writers opened with
    different retentions must fold identically."""
    m0 = base_manifest()
    m0.id_retention = 3
    store_a = mk_store(id_retention=10_000)
    store_a.commit(m0)
    m = store_a.read_current()
    for v in range(1, 7):
        m = store_a.commit_delta(m, make_delta(v))
    assert m.id_retention == 3  # survives apply_delta propagation
    assert len(m.applied_ids) == 3  # persisted window, not the handle's

    # a second handle with a DIFFERENT ctor retention sees and applies
    # the same persisted window
    store_b = mk_store(id_retention=1)
    got = store_b.read_current()
    assert got.id_retention == 3
    m2 = store_b.commit_delta(got, make_delta(7))
    assert len(m2.applied_ids) == 3

    # legacy tables (no persisted value) still honor the handle's
    assert base_manifest().id_retention is None


def test_id_retention_zero_rejected(mk_store, tmp_path):
    """ADVICE r5: id_retention=0 would make the [-0:] fold keep the
    ENTIRE applied_ids list (unbounded growth). Both entry points
    reject it."""
    import pytest as _pytest

    from cityofphiladelphia_databridge_etl_tools_spark.lake.manifest import MetaStore

    with _pytest.raises(ValueError, match="id_retention"):
        MetaStore(str(tmp_path / "t0"), id_retention=0)
    with _pytest.raises(ValueError, match="id_retention"):
        MetaStore(str(tmp_path / "t1"), id_retention=-5)
