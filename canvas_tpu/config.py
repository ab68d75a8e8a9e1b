"""Global configuration for canvas_tpu.

Precision policy: the reference pipeline does all statistics in C# doubles.
For bit-level parity testing we support float64 (enable_x64); for TPU
throughput the default compute dtype is float32, which preserves call-level
(EvaluateCNV-equal) behaviour on the demo data.  Hot kernels (Viterbi,
binning) accumulate in float32; stats reductions that feed thresholds
(medians, quartiles) run in float64 on host or on device when x64 is on.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def enable_x64() -> None:
    """Turn on float64 support in JAX (parity mode; slower on TPU)."""
    import jax

    jax.config.update("jax_enable_x64", True)


@dataclass
class CanvasConfig:
    """Tunable constants shared across stages.

    Mirrors the reference's JSON parameter files
    (CanvasPartitionParameters.json, PedigreeCallerParameters.json,
    SomaticCallerParameters.json, QualityScoreParameters.json); defaults are
    the reference defaults.
    """

    # CanvasBin (reference CanvasBin/Program.cs): median observed reads/bin.
    counts_per_bin: int = 100
    # Coverage mode cap (TruncatedDynamicRange; CanvasBin.cs:618-625)
    truncated_dynamic_range_cap: int = 10
    # CanvasBin -m/--mode (Utilities.ParseCanvasCoverageMode)
    coverage_mode: str = "TruncatedDynamicRange"
    # CanvasBin -z/--binsize: fixed bin size overriding the rate estimate
    fixed_bin_size: int | None = None

    # CanvasClean -m/--mode (MedianByGC | LOESS) and -w/--weightedmedian
    gc_norm_mode: str = "MedianByGC"
    min_bins_per_gc_weighted_median: int = 100

    # CanvasPartition -m/--method override (None = per-mode default)
    partition_method: str | None = None
    # Run the CanvasSmooth repeated-median filter on enrichment target bins
    # before T/N normalization.  Default OFF: the reference ships
    # CanvasSmooth as a standalone stage with no caller in its own
    # orchestration (only external ISAS wrappers invoke it), and smoothing
    # both samples independently creates zero-noise plateaus that break
    # CBS's permutation null (every plateau step tests as significant).
    smooth_enrichment_bins: bool = False

    # CanvasNormalize -m/--mode (WeightedAverage | BestLR2 | PCA)
    normalize_mode: str = "WeightedAverage"

    # CanvasSomaticCaller training mode: any modeling exception produces an
    # empty-but-valid VCF instead of failing (SomaticCaller.cs:409-422)
    somatic_training_mode: bool = False

    # CanvasPartition (CanvasPartitionParameters.json)
    max_inter_bin_dist_in_segment: int = 1000000
    mad_factor: float = 2.0
    cbs_alpha: float = 0.01
    evenness_score_threshold: float = 94.5
    evenness_score_window: int = 100000
    threshold_lower_maf: float = 0.05

    # HMM segmentation (HiddenMarkovModelsRunner.cs)
    hmm_states: int = 5
    hmm_self_transition: float = 0.99
    hmm_min_bins_per_chromosome: int = 10

    # Callers
    diploid_max_copy_number: int = 10            # CanvasDiploidCaller.cs:15
    diploid_coverage_weighting: float = 0.6      # CanvasDiploidCaller.cs:25
    median_het_snps_distance: int = 463          # CanvasDiploidCaller.cs:28
    quality_filter_threshold: int = 10           # CanvasDiploidCaller.cs:31
    pedigree_max_copy_number: int = 5            # PedigreeCallerParameters.json
    denovo_rate: float = 1e-5
    denovo_quality_threshold: int = 20
    # DefaultCaller (PedigreeCallerParameters.cs:25-27):
    # VariantCaller | HaplotypeVariantCaller
    pedigree_caller: str = "VariantCaller"

    # Q-score logistic coefficients (QualityScoreParameters.json)
    qscore: dict = field(default_factory=lambda: dict(DEFAULT_QSCORE_PARAMS))


# Reference QualityScoreParameters.json values.
DEFAULT_QSCORE_PARAMS = {
    "logistic_germline_intercept": -5.0123,
    "logistic_germline_log_bin_count": 4.9801,
    "logistic_germline_model_distance": -5.5472,
    "logistic_germline_distance_ratio": -1.7914,
    "logistic_intercept": -0.5143,
    "logistic_log_bin_count": 0.8596,
    "logistic_model_distance": -50.4366,
    "logistic_distance_ratio": -0.6511,
    "generalized_linear_fit_intercept": -3.65,
    "generalized_linear_fit_log_bin_count": -1.12,
    "generalized_linear_fit_model_distance": 3.89,
    "generalized_linear_fit_major_chromosome_count": 0.47,
    "generalized_linear_fit_maf_mean": -0.68,
    "generalized_linear_fit_log_maf_cv": -0.25,
}


DEFAULT = CanvasConfig()

_COMPILE_CACHE_SET = [False]


def enable_compilation_cache() -> None:
    """Ensure the package-level persistent XLA compile cache is active
    (canvas_tpu.__init__._enable_persistent_xla_cache configures it at
    import; this just re-applies it for callers that tweaked jax config
    afterwards).  Opt out with CANVAS_TPU_NO_XLA_CACHE=1."""
    if _COMPILE_CACHE_SET[0]:
        return
    _COMPILE_CACHE_SET[0] = True
    try:
        import canvas_tpu

        canvas_tpu._enable_persistent_xla_cache()
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_WARMUP_THREAD = None
# bytes/s host->device, measured once by the warmup thread (None = unknown)
_SESSION_H2D_BPS: list = [None]


def hedge_grace() -> float:
    """The hedge grace period (seconds) — see hedged_fetch."""
    return float(os.environ.get("CANVAS_TPU_FETCH_GRACE_S", "10"))


def session_ready() -> bool:
    """True when the device session is known-open (the warmup thread's
    trivial fetch has completed) or no warmup was requested.  Stage code
    uses this to skip dispatching genome-length device work at a session
    that has not opened yet — the hedge would only burn its grace period."""
    t = _WARMUP_THREAD
    if t is None:
        return True
    return not t.is_alive()


def predicted_h2d_seconds(n_bytes: int) -> float | None:
    """Expected host->device transfer time at the measured session
    bandwidth, or None while unmeasured (warmup still running / no device).
    A generous 2x slack keeps the estimate conservative on bursty links."""
    bps = _SESSION_H2D_BPS[0]
    if not bps:
        return None
    return 2.0 * n_bytes / bps


def warm_device_session() -> "object | None":
    """Pay the device session's first-fetch toll off the critical path.

    On a tunneled TPU the process's FIRST host fetch of any device result
    intermittently blocks for minutes while the remote session spins up
    (measured 45-400 s; every later fetch runs at wire speed).  Any fetch
    absorbs it, so a daemon thread fetches a trivial jit result while the
    caller gets on with host-side work (reference-track parsing, BAM
    ingest).  Runs once per process; safe and ~instant on CPU backends.
    Returns the thread so callers can join() before timing-sensitive work.
    """
    global _WARMUP_THREAD
    enable_compilation_cache()
    if _WARMUP_THREAD is not None:
        return _WARMUP_THREAD
    import threading

    def _warm():
        try:
            import time as _time

            import jax
            import jax.numpy as jnp
            import numpy as _np

            _np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros(8)))
            if jax.default_backend() != "cpu":
                # measure host->device bandwidth once the session is open;
                # stage code uses it to decide device vs host-oracle paths
                probe = _np.zeros(16 << 20, _np.uint8)
                t0 = _time.monotonic()
                jnp.asarray(probe).block_until_ready()
                dt = max(_time.monotonic() - t0, 1e-6)
                _SESSION_H2D_BPS[0] = probe.nbytes / dt
        except Exception:  # pragma: no cover - no device: nothing to warm
            pass

    _WARMUP_THREAD = threading.Thread(
        target=_warm, daemon=True, name="canvas-tpu-session-warmup")
    _install_teardown_guard()
    _WARMUP_THREAD.start()
    return _WARMUP_THREAD


# Abandoned hedge-fetch threads (stalled inside a device RPC).  Interpreter
# teardown with a thread blocked in the client RPC layer aborts the process
# AFTER all useful work is done, so if any are still alive at exit we flush
# and skip C++ teardown.  Caveat: a SystemExit(n) racing an abandoned fetch
# loses its exit code (uncaught exceptions are preserved via excepthook).
_ABANDONED_FETCHES: list = []
_EXIT_CODE = [0]


def _teardown_guard():  # pragma: no cover - exercised only on stalls
    pending = list(_ABANDONED_FETCHES)
    if _WARMUP_THREAD is not None:
        pending.append(_WARMUP_THREAD)
    if any(t.is_alive() for t in pending):
        import sys
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(_EXIT_CODE[0])


_GUARD_INSTALLED = [False]


def _install_teardown_guard() -> None:
    import atexit
    import sys

    if _GUARD_INSTALLED[0]:
        return
    _GUARD_INSTALLED[0] = True
    atexit.register(_teardown_guard)
    old_hook = sys.excepthook

    def hook(tp, value, tb):
        _EXIT_CODE[0] = 1
        old_hook(tp, value, tb)

    sys.excepthook = hook


def race_fetch(fetch_fn, fallback_fn):
    """Race a device fetch against its exact host oracle; first one wins.

    Used for the big genome-length stages where predicting whether the
    (possibly stalled) device session or the host is faster is unreliable:
    both run concurrently on daemon threads — the host work releases the
    GIL in its numpy cores — and whichever produces a result first is
    returned.  The loser keeps running harmlessly (its result is dropped);
    a loser blocked inside a device RPC is registered so interpreter
    teardown skips the aborting C++ cleanup.  Results must be equivalent —
    all our fallbacks are the exact oracles the kernels are tested against.
    On CPU backends the fetch is local and runs inline.
    """
    import threading

    try:
        import jax
        if jax.default_backend() == "cpu":
            return fetch_fn()
    except Exception:  # pragma: no cover
        return fetch_fn()

    slots: dict = {}
    done = threading.Event()

    def run(name, fn):
        try:
            r = fn()
            slots.setdefault("winner", (name, r))   # GIL-atomic
        except Exception as e:  # pragma: no cover - surfaced below
            slots[name + "_error"] = e
        finally:
            done.set()

    t_fetch = threading.Thread(target=run, args=("fetch", fetch_fn),
                               daemon=True, name="canvas-tpu-fetch")
    t_fall = threading.Thread(target=run, args=("fallback", fallback_fn),
                              daemon=True, name="canvas-tpu-fallback")
    t_fetch.start()
    t_fall.start()
    while True:
        if "winner" in slots:
            name, result = slots["winner"]
            if name == "fallback" and t_fetch.is_alive():
                import sys
                print("[canvas_tpu] host oracle beat the device fetch "
                      "(stalled session?); using host results",
                      file=sys.stderr)
                _ABANDONED_FETCHES.append(t_fetch)
                _install_teardown_guard()
            return result
        if "fetch_error" in slots and "fallback_error" in slots:
            raise slots["fetch_error"]
        done.wait(timeout=0.1)


def hedged_fetch(fetch_fn, fallback_fn, grace: float | None = None,
                 ready=None):
    """Device→host fetch with an exact host-oracle hedge.

    Remote/tunneled device sessions can stall for minutes, either before
    results materialize (session open) or inside the D2H RPC itself.  Two
    layers guard the critical path:
      1. when `ready` (a list of jax arrays) is given, poll is_ready() —
         threadless — until `grace` expires; never ready → fallback_fn();
      2. once ready (or with no `ready` handle), run fetch_fn() in a daemon
         thread with its own `grace`; a stalled fetch → fallback_fn(), and
         the abandoned thread is registered so interpreter teardown skips
         the aborting C++ cleanup.
    fetch and fallback must be equivalent — all our fallbacks are the exact
    oracles the kernels are unit-tested against.  On CPU backends the fetch
    is local and runs inline.  Grace defaults to $CANVAS_TPU_FETCH_GRACE_S
    (10 s); non-positive grace disables the hedge.  For stages where both
    sides cost tens of seconds, prefer race_fetch.
    """
    import threading
    import time

    if grace is None:
        grace = hedge_grace()
    if grace <= 0:
        return fetch_fn()
    try:
        import jax
        local_backend = jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover
        local_backend = True
    import os as _os

    if local_backend and _os.environ.get("CANVAS_TPU_FORCE_HEDGE") != "1":
        # CPU fetches are local memory reads — no RPC to hedge against.
        # CANVAS_TPU_FORCE_HEDGE=1 exercises the full hedge machinery on
        # the CPU backend (fault-injection tests).
        return fetch_fn()

    import sys

    if ready is not None:
        deadline = time.monotonic() + grace
        while not all(r.is_ready() for r in ready if hasattr(r, "is_ready")):
            if time.monotonic() >= deadline:
                print(f"[canvas_tpu] device results not ready after "
                      f"{grace:.0f}s (stalled session?); computing on the "
                      f"host oracle", file=sys.stderr)
                return fallback_fn()
            time.sleep(0.02)

    result: dict = {}
    done = threading.Event()

    def _run():
        try:
            result["value"] = fetch_fn()
        except Exception as e:  # pragma: no cover - surfaced below
            result["error"] = e
        finally:
            done.set()

    t = threading.Thread(target=_run, daemon=True, name="canvas-tpu-fetch")
    t.start()
    if done.wait(grace):
        if "error" in result:
            raise result["error"]
        return result["value"]
    print(f"[canvas_tpu] device fetch still blocked after {grace:.0f}s "
          f"(stalled RPC); computing on the host oracle", file=sys.stderr)
    fallback = fallback_fn()
    if done.is_set() and "value" in result:
        return result["value"]
    _ABANDONED_FETCHES.append(t)
    _install_teardown_guard()
    return fallback


def running_on_tpu() -> bool:
    import jax

    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover - no devices at all
        return False


def default_device_count() -> int:
    import jax

    return jax.device_count()


def cpu_mesh_env(n: int = 8) -> dict:
    """Environment variables that simulate an n-device CPU mesh (for tests)."""
    return {
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}",
    }


# ---------------------------------------------------------------------------
# JSON parameter files (SURVEY.md §5 config tier 3): the reference ships
# SomaticCallerParameters.json / PedigreeCallerParameters.json /
# QualityScoreParameters.json / CanvasPartitionParameters.json next to the
# binaries and deserializes them at startup.  load_parameter_file applies a
# file of the same shape: CanvasConfig fields by snake_case name, somatic
# caller constants by their PascalCase JSON name.
# ---------------------------------------------------------------------------

# SomaticCallerParameters.json name -> canvas_tpu.models.somatic attribute
SOMATIC_JSON_FIELDS = {
    "MaximumCopyNumber": "MAX_COPY_NUMBER",
    "MinimumVariantFrequenciesForInformativeSegment": "MIN_VF_FOR_INFORMATIVE",
    "CoverageWeighting": "COVERAGE_WEIGHTING",
    "CoverageWeightingWithMafSegmentation": "COVERAGE_WEIGHTING_WITH_MAF",
    "EvennessScoreThreshold": "EVENNESS_THRESHOLD",
    "MinEvennessScore": "MIN_EVENNESS",
    "LowerCoverageLevelWeightingFactor": "LOWER_COVERAGE_FACTOR",
    "UpperCoverageLevelWeightingFactor": "UPPER_COVERAGE_FACTOR",
    "DeviationFactor": "DEVIATION_FACTOR",
    "DeviationIndexCutoff": "DEVIATION_INDEX_CUTOFF",
    "PrecisionWeightingFactor": "PRECISION_WEIGHTING_FACTOR",
    "HeterogeneityWeight": "HETEROGENEITY_WEIGHT",
    "DistanceRatio": "DISTANCE_RATIO",
    "MinimumCallSize": "MINIMUM_CALL_SIZE",
}


def load_parameter_file(path, config: "CanvasConfig | None" = None
                        ) -> "CanvasConfig":
    """Apply a reference-style JSON parameter file.

    snake_case keys update CanvasConfig fields; PascalCase keys matching
    SomaticCallerParameters.json update the somatic module constants.
    Unknown keys raise (typos in tuned parameter files must not be
    silently ignored)."""
    import dataclasses
    import json
    from pathlib import Path

    from canvas_tpu.models import somatic

    data = json.loads(Path(path).read_text())
    config = config or CanvasConfig()
    field_names = {f.name for f in dataclasses.fields(CanvasConfig)}
    for key, value in data.items():
        if key in field_names:
            setattr(config, key, value)
        elif key in SOMATIC_JSON_FIELDS:
            setattr(somatic, SOMATIC_JSON_FIELDS[key], value)
        elif key == "QualityScoreParameters":
            config.qscore.update(value)
        else:
            raise ValueError(f"unknown parameter {key!r} in {path}")
    return config
