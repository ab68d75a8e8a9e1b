"""Whole-recursion device CBS engine (ops/cbs_mega.py) vs the host parity
oracle (ops/cbs.py).

Runs on the CPU backend (conftest forces JAX_PLATFORMS=cpu) with the engine
force-enabled via CANVAS_TPU_CBS_MEGA=1 — the same code path that is the
production default on accelerator backends.  End-to-end pins use strongly
planted signals where the documented threefry-vs-MT RNG deviation cannot
change any accept/reject decision (the same contract as
test_cbs_device.py); structural tests cover the fixed-capacity table
overflow -> frontier fallback, undo passes, edge-location tests, and
determinism.

Reference semantics pinned: CanvasPartition/ChangePoint.cs:44-153 (the
recursion), :206-246 (sequential-stopping walk), :359-398 (edge tests).
"""

import numpy as np
import pytest

from canvas_tpu.ops import cbs
from canvas_tpu.ops import cbs_mega


@pytest.fixture
def rng():
    return np.random.default_rng(13)


@pytest.fixture
def force_mega(monkeypatch):
    monkeypatch.setenv("CANVAS_TPU_CBS_FRONTIER", "1")
    monkeypatch.setenv("CANVAS_TPU_CBS_MEGA", "1")


def _host(cov, n_perm=500, undo="none"):
    return cbs._run_cbs_host(cov, cbs.DEFAULT_ALPHA, n_perm, undo, 0)


def _planted(rng, n=1000, events=((200, 400, 4.0), (700, 800, -5.0))):
    r = rng.normal(0, 1, n)
    for s, e, d in events:
        r[s:e] += d
    return r


def test_mega_planted_matches_host_oracle(rng, force_mega):
    """Multi-contig planted data: identical segment lengths to the host
    oracle, dispatched through run_cbs (the production entry)."""
    cov = {f"chr{c}": _planted(rng) for c in range(3)}
    got = cbs.run_cbs(cov, n_perm=500)
    assert cbs.last_engine() == "mega"
    want = _host(cov)
    for k in cov:
        np.testing.assert_array_equal(got[k], want[k]), k


def test_mega_direct_entry_matches_host(rng):
    """run_cbs_mega called directly (no env gating) equals the oracle."""
    cov = {"chrA": _planted(rng, events=((100, 350, 3.5),)),
           "chrB": _planted(rng, events=((500, 900, -3.0),))}
    got = cbs_mega.run_cbs_mega(cov, n_perm=500)
    assert got is not None
    want = _host(cov)
    for k in cov:
        np.testing.assert_array_equal(got[k], want[k]), k


@pytest.mark.parametrize("undo", ["prune", "sdundo"])
def test_mega_undo_passes(rng, undo):
    """SD-undo / prune split-undo run on the mega engine's leaves and
    match the host recursion + undo end to end."""
    r = _planted(rng, events=((300, 600, 4.0),))
    cov = {"chr1": r}
    got = cbs_mega.run_cbs_mega(cov, n_perm=500, undo_method=undo)
    assert got is not None
    want = _host(cov, undo=undo)
    np.testing.assert_array_equal(got["chr1"], want["chr1"])


def test_mega_edge_location_paths(rng):
    """Events touching the window edges exercise the at_start/at_end split
    bookkeeping and the TPermP edge tests (ChangePoint.cs:359-398)."""
    cov = {
        # change at the very start: i1 == 0 branch
        "start": np.concatenate([rng.normal(5, 1, 250),
                                 rng.normal(0, 1, 750)]),
        # change at the very end: i2 == n branch
        "end": np.concatenate([rng.normal(0, 1, 760),
                               rng.normal(-5, 1, 240)]),
        # interior event: both edge tests run
        "mid": _planted(rng, events=((450, 650, 4.5),)),
    }
    got = cbs_mega.run_cbs_mega(cov, n_perm=500)
    assert got is not None
    want = _host(cov)
    for k in cov:
        np.testing.assert_array_equal(got[k], want[k]), k


def test_mega_table_overflow_returns_none(rng, force_mega):
    """More leaves than the fixed-capacity table holds -> the engine
    reports overflow (None) and run_cbs falls back to the frontier engine
    with the host-identical result."""
    # 1 contig -> S = 64 slots; ~85 strongly alternating segments overflow
    n, period = 1020, 12
    r = rng.normal(0, 0.3, n)
    for i, s in enumerate(range(0, n, period)):
        r[s: s + period] += 6.0 * (i % 2)
    cov = {"chr1": r}
    assert cbs_mega.run_cbs_mega(cov, n_perm=500) is None
    got = cbs.run_cbs(cov, n_perm=500)
    assert cbs.last_engine() == "frontier"
    want = _host(cov)
    np.testing.assert_array_equal(got["chr1"], want["chr1"])


def test_mega_edge_cases(rng):
    """Empty / tiny / constant contigs follow run_cbs_device's
    conventions ([0] for empty, whole-window leaf otherwise)."""
    cov = {
        "chr1": _planted(rng, n=900, events=((200, 500, 4.0),)),
        "empty": np.array([]),
        "tiny": np.array([1.0, 2.0]),
        "const": np.full(300, 7.0),
    }
    got = cbs_mega.run_cbs_mega(cov, n_perm=500)
    assert got is not None
    assert list(got["empty"]) == [0]
    assert list(got["tiny"]) == [2]
    assert list(got["const"]) == [300]
    want = _host({"chr1": cov["chr1"]})
    np.testing.assert_array_equal(got["chr1"], want["chr1"])


def test_mega_pure_noise_no_splits(rng):
    """Pure noise: the boundary walk must reject everywhere (one leaf per
    contig), same as the host oracle."""
    cov = {f"chr{c}": rng.normal(0, 1, 800) for c in range(2)}
    got = cbs_mega.run_cbs_mega(cov, n_perm=500)
    assert got is not None
    for k, v in cov.items():
        assert list(got[k]) == [len(v)], k


def test_mega_deterministic(rng):
    cov = {"chr1": _planted(rng, events=((250, 550, 3.0),)),
           "chr2": rng.normal(0, 1, 640)}
    a = cbs_mega.run_cbs_mega(cov, n_perm=500)
    b = cbs_mega.run_cbs_mega(cov, n_perm=500)
    assert a is not None and b is not None
    for k in cov:
        np.testing.assert_array_equal(a[k], b[k])


def test_mega_too_many_contigs_returns_none(rng):
    cov = {f"chr{c}": rng.normal(0, 1, 16) for c in range(200)}
    assert cbs_mega.run_cbs_mega(cov, n_perm=500) is None


def test_mega_env_gate(monkeypatch):
    monkeypatch.setenv("CANVAS_TPU_CBS_MEGA", "0")
    assert not cbs_mega.mega_cbs_enabled()
    monkeypatch.setenv("CANVAS_TPU_CBS_MEGA", "1")
    assert cbs_mega.mega_cbs_enabled()


def test_engine_attribution_host_path(rng, monkeypatch):
    """With device engines disabled, run_cbs records the host engine."""
    monkeypatch.setenv("CANVAS_TPU_CBS_FRONTIER", "0")
    cov = {"chr1": _planted(rng, n=600, events=((150, 350, 4.0),))}
    cbs.run_cbs(cov, n_perm=500)
    assert cbs.last_engine() == "host"
