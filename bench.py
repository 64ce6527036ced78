"""Benchmark driver: proof-generation wall time for the Fibonacci program.

Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": "seconds", "vs_baseline": N}

Sizing matches the reference's benchmark table (reference README.md:146-162):
its "Operation Count" column equals the execution-trace length (one VM op per
trace step; the quoted RAM figures only fit that reading), so we build the
same Fibonacci program (reference examples/fibonacci.rs) sized so the padded
trace has exactly 2^k steps and compare against the 2^k table row.
vs_baseline is baseline_time / our_time (>1 = faster than the reference's
published single-core number).

Usage: python bench.py [log2_trace]     (explicit size: bench that one size)
       python bench.py                  (ladder: climb 2^12 -> 2^18 as the
                                         deadline allows, report the largest)

Reliability design (the round-1 run timed out and reported nothing):
- ONE process only.  The TPU in this deployment sits behind a network tunnel
  where backend init + first compile costs ~1-2 minutes, and two processes
  opening the device serialize against each other -- so no subprocess probes.
- A watchdog thread prints the best measurement so far and hard-exits before
  the external deadline (DISTAFF_BENCH_DEADLINE_S, default 480 s), so a
  wedged tunnel or a too-ambitious size can never yield "no output".
- The ladder starts small: the first rung doubles as the device probe and
  guarantees some measurement lands even if larger sizes don't fit.
"""

import json
import os
import sys
import threading
import time

_START = time.time()
REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEADLINE_S = float(os.environ.get("DISTAFF_BENCH_DEADLINE_S", "480"))
MARGIN_S = 8.0  # watchdog fires this long before the deadline

# reference proving times (seconds) by log2(trace length), README.md:151-157
BASELINES = {8: 0.19, 10: 0.35, 12: 1.0, 14: 4.5, 16: 18.0, 18: 78.0, 20: 1080.0}

_lock = threading.Lock()
_best = None  # best (largest-size) completed measurement
_done = threading.Event()


_best_size = -1


def _record(log2_trace, elapsed, warm):
    global _best, _best_size
    with _lock:
        baseline = BASELINES.get(log2_trace)
        # keep the LARGEST completed size (rungs may run out of order when
        # the budget only fits one more large rung)
        if log2_trace >= _best_size:
            _best_size = log2_trace
            small = (_best or {}).get("small_rungs")
            _best = {
                "metric": f"fibonacci_2^{log2_trace}_step_trace_proof_gen_wall_time",
                "value": round(elapsed, 3),
                "unit": "seconds",
                "vs_baseline": round(baseline / elapsed, 4) if baseline else 0,
            }
            if small:
                _best["small_rungs"] = small
    print(f"# 2^{log2_trace}: {elapsed:.2f}s steady (warm-up incl. compile "
          f"{warm:.1f}s); baseline {baseline}s", file=sys.stderr)


def _emit_and_exit(code=0):
    with _lock:
        out = _best or {
            "metric": "fibonacci_proof_gen_wall_time",
            "value": -1,
            "unit": "seconds",
            "vs_baseline": 0,
            "error": "no measurement completed within deadline",
        }
    print(json.dumps(out), flush=True)
    sys.stderr.flush()
    os._exit(code)


def _watchdog():
    budget = DEADLINE_S - (time.time() - _START) - MARGIN_S
    if not _done.wait(timeout=max(1.0, budget)):
        print("# watchdog: deadline reached, emitting best-so-far",
              file=sys.stderr)
        _emit_and_exit(0)


def _remaining():
    return DEADLINE_S - (time.time() - _START) - MARGIN_S


def fibonacci_program(assembly, log2_trace):
    # each unrolled 'swap dup.2 drop add' iteration costs 64/3 trace steps
    # after span padding (4 real ops + 12 noops per 16-step sub-cycle), so
    # 3N/64 iterations pad to exactly an N-step trace
    n_iter = (1 << log2_trace) * 3 // 64
    return assembly.compile(f"begin repeat.{n_iter} swap dup.2 drop add end end")


def main():
    explicit = int(sys.argv[1]) if len(sys.argv) > 1 else None

    threading.Thread(target=_watchdog, daemon=True).start()

    from distaff_tpu import jax_setup
    jax_setup.configure()
    import jax

    platform = jax.devices()[0].platform
    on_cpu = platform == "cpu"
    print(f"# devices: {jax.devices()} (platform {platform})", file=sys.stderr)

    if not on_cpu:
        # Kick off device bring-up IMMEDIATELY and asynchronously.  On the
        # tunneled TPU the first real device use triggers a one-time grant/
        # bring-up measured at 100-370 s that proceeds in the background from
        # the first enqueued op - everything host-side (imports, VM trace
        # generation, kernel compiles) overlaps with it, and the pipeline's
        # first device-to-host sync absorbs whatever remains.
        import numpy as _np
        jax.jit(lambda v: v + 1)(jax.device_put(_np.arange(8, dtype=_np.uint32)))
        # Enqueue one dispatch of every canonical NTT kernel so ALL transform
        # executable loads happen here, overlapping bring-up: the canonical
        # kernel set is keyed by transform size alone (ops/tiles.py), so no
        # ladder rung loads a fresh transform executable afterwards.
        from distaff_tpu.ops import tiles
        tiles.warm_kernels()

    if explicit is not None:
        sizes = [explicit]
    elif on_cpu:
        sizes = [10, 12, 14]
    else:
        # start the ladder at the TOP half: the canonical per-size NTT
        # kernels (ops/tiles.py round 5) plus warm_kernels() above mean a
        # fresh rung loads no new transform executables - only small
        # per-geometry glue - so one 2^16 probe absorbs the one-time
        # bring-up + shared-kernel loads and guarantees a measurement, then
        # the budget goes to the headline rungs (2^18, 2^20 - reference
        # README.md:156-157) instead of being spent bottom-up (round-3
        # failure mode: five small rungs ate the deadline and 2^20 was
        # never attempted).  The persistent compile cache (.jax_cache_tpu,
        # unsalted: TPU executables are machine-independent) is pre-warmed
        # by tools/warm_cache.py, so warm-up ~ steady-state past the probe.
        sizes = [16, 18, 20]

    import distaff_tpu
    from distaff_tpu import assembly, ProgramInputs, ProofOptions

    inputs = ProgramInputs.from_public([1, 0])
    options = ProofOptions()  # default: ext 32, 50 queries, grind 20 (120-bit)

    def run_rung(log2_trace, rerun_estimate):
        """Prove once (warm), record, then re-run for a steady number when
        the budget allows.  Returns the best elapsed time, or None on error.

        The FIRST rung's warm time is dominated by one-time process costs
        (device bring-up, host-side lowering, shared-kernel loads) that say
        nothing about the re-run cost, so the probe passes a small fixed
        rerun_estimate.  Later rungs share every transform executable with
        the probe (canonical per-size kernels, ops/tiles.py), so their warm
        time is close to steady and doubles as the re-run bound."""
        try:
            program = fibonacci_program(assembly, log2_trace)
            t0 = time.time()
            outputs, proof = distaff_tpu.execute(program, inputs, 1, options)
            warm = time.time() - t0
            assert proof.trace_length() == 1 << log2_trace, proof.trace_length()
            assert distaff_tpu.verify(
                program.hash, inputs.get_public_inputs(), outputs, proof)
        except BaseException as exc:  # noqa: BLE001 - keep the best-so-far
            import traceback
            traceback.print_exc()
            print(f"# rung 2^{log2_trace} failed: {exc!r}; keeping best-so-far",
                  file=sys.stderr)
            return None
        elapsed = warm
        _record(log2_trace, elapsed, warm)
        # attempt the steady re-run whenever ANY budget remains: the warm
        # number is already recorded, so a watchdog fire mid-re-run loses
        # nothing, while a warm pass inflated by executable loads (measured
        # 156 s vs 43 s steady at 2^20) must not block the honest number
        if _remaining() > max(25.0, rerun_estimate or 0.0):
            try:
                t0 = time.time()
                outputs, proof = distaff_tpu.execute(program, inputs, 1, options)
                elapsed = time.time() - t0
                _record(log2_trace, elapsed, warm)
            except BaseException:  # noqa: BLE001
                return None
        return elapsed

    probe_elapsed = run_rung(sizes[0], 45.0)
    if probe_elapsed is not None and len(sizes) > 1:
        # budget-adaptive ladder: per-rung cost models from the probe's
        # steady time (4-5x data scaling per 2 log2 steps, plus small
        # per-geometry glue; the 2^20 rung adds streaming-mode overheads).
        # When only ONE more rung fits, prefer the LARGEST (the headline) -
        # _record keeps the largest completed size.
        def cost(l2):
            scale = 4.5 ** ((l2 - sizes[0]) / 2.0)
            return scale * probe_elapsed + (60.0 if l2 >= 20 else 25.0)

        rest = [l2 for l2 in sizes[1:]]
        planned = []
        budget = _remaining()
        if budget >= sum(cost(l2) for l2 in rest):
            planned = rest                          # everything fits
        else:
            for l2 in sorted(rest, reverse=True):   # largest first
                if budget >= cost(l2):
                    planned = [l2]
                    break
        if planned != rest:
            print(f"# adaptive ladder: remaining {budget:.0f}s -> "
                  f"{planned or 'nothing'} (costs "
                  f"{[round(cost(l2)) for l2 in rest]})", file=sys.stderr)
        extras = {}

        def run_small_rungs(time_guard):
            """Record the reference's SMALL rows (README.md:151-153: 0.35 s /
            1.0 s at 2^10 / 2^12).  A small rung's FIRST in-process run pays
            its geometry's executable loads (measured 60-170 s over the
            tunnel when run after a 2^20 rung) and says nothing about proving
            speed, so a rung is only recorded when a steady re-run landed;
            time_guard bounds the remaining budget a rung may start with."""
            for l2 in (12, 10):
                if f"2^{l2}" in extras or _remaining() < time_guard:
                    continue
                try:
                    program = fibonacci_program(assembly, l2)
                    best = None
                    runs = 0
                    for _ in range(2):
                        t0 = time.time()
                        outputs, proof = distaff_tpu.execute(
                            program, inputs, 1, options)
                        el = time.time() - t0
                        assert distaff_tpu.verify(
                            program.hash, inputs.get_public_inputs(), outputs,
                            proof)
                        best = el if best is None else min(best, el)
                        runs += 1
                        if _remaining() < 15.0:
                            break
                    if runs >= 2:
                        extras[f"2^{l2}"] = {
                            "seconds": round(best, 3),
                            "vs_baseline": round(BASELINES[l2] / best, 3)}
                        with _lock:
                            if _best is not None:
                                _best["small_rungs"] = dict(extras)
                        print(f"# small rung 2^{l2}: {best:.2f}s "
                              f"(baseline {BASELINES[l2]}s)", file=sys.stderr)
                    else:
                        print(f"# small rung 2^{l2}: loads-only first pass "
                              f"{best:.2f}s, no budget for a steady re-run; "
                              f"not recorded", file=sys.stderr)
                except BaseException:  # noqa: BLE001
                    break

        prev = probe_elapsed
        for l2 in planned:
            if l2 >= 20 and _remaining() > cost(l2) + 100.0:
                # fit the small rows in BEFORE the memory-heavy streaming
                # rung: loads cost ~60 s here vs ~170 s after 2^20, and the
                # +100 s guard keeps the headline rung safe either way
                run_small_rungs(cost(l2) + 90.0)
            if _remaining() < cost(l2):
                print(f"# skipping 2^{l2}: predicted {cost(l2):.0f}s > "
                      f"remaining {_remaining():.0f}s", file=sys.stderr)
                break
            prev = run_rung(l2, None)
            if prev is None:
                break

        # leftover budget: pick up any small row not already recorded
        run_small_rungs(25.0)
        if extras:
            with _lock:
                if _best is not None:
                    _best["small_rungs"] = extras

    _done.set()
    _emit_and_exit(0)


if __name__ == "__main__":
    try:
        main()
    except BaseException as exc:  # noqa: BLE001 - the JSON line must land
        import traceback
        traceback.print_exc()
        print(f"# rung failed: {exc!r}; emitting best-so-far", file=sys.stderr)
        _done.set()
        _emit_and_exit(0)
