"""Benchmark: all six scopes, fused, on 4K frames, one chip.

Target (BASELINE.json): >600 fps of 4K frames per TPU v5e chip with the
reference's default settings (statistics at target_scale=2, overlays at
full resolution).  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Measurement design: the dev setup reaches the TPU through a tunnel with
a ~30 ms (and NOISY: 25-55 ms observed) host<->device round trip, so
per-call timing measures the tunnel, not the chip.  The benchmark scans
the full six-scope step over a batch of HBM-resident frames inside ONE
XLA program and times the span at TWO batch sizes: the per-frame cost is
the slope (t(2B) - t(B)) / B, which cancels the constant round trip
exactly instead of estimating it from a separate (noisy) tiny call.
Frames are HBM-resident, matching the reference whose capture is
GPU-resident (its GPU->CPU staging copy is the hop this design removes,
reference src/common.c:316-320).

Keeping the work honest without charging harness overhead to the step:
  * anti-hoist: every iteration's tm scalar differs, and tm feeds the
    SAME Mosaic kernel that reads the frame (the zebra stripe phase), so
    the kernel call — and everything downstream of its outputs — is
    loop-variant and cannot be hoisted or folded.  An input XOR would add
    a 33 MB copy per frame (an XLA fusion cannot be inlined into a
    custom-call operand), and a carried in-place row update measured
    ~0.9 ms/frame slower (XLA copies the carry);
  * liveness: tiny outputs (stats, rendered scope images) are fully
    checksummed; the three full-res overlay images come out of ONE
    opaque Mosaic kernel, so a strided sample keeps the entire kernel
    alive (XLA cannot dead-code-eliminate parts of a custom call) while
    a full 3x33 MB re-read per frame would bill ~0.15 ms/frame of pure
    benchmark overhead to the step.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    _apply_forced_platform(jax)

    # persistent compile cache (no-op on the axon dev plugin, which never
    # serializes executables — the observed repeat-run speedups come from
    # the tunnel's own server-side cache, an LRU that other compiles can
    # evict; budget ~6 min per cold loop program)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/ocm_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from obs_color_monitor_tpu.api import make_full_step
    from obs_color_monitor_tpu.colorspace import Colorspace

    H, W = 2160, 3840  # 4K
    # base batch: big enough that the measured slope span (B x ~2 ms)
    # dwarfs timer jitter; the tunnel round trip cancels in the slope
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    # best-of-9, INTERLEAVED: single spans occasionally read ~5% high
    # (tunnel/host scheduling jitter), and the shared dev TPU drifts
    # between fast/slow states over minutes (observed 548->617 fps across
    # three runs, 2026-08-17) — taking all B reps then all 2B reps lets a
    # state change between the blocks skew the slope, so the two batch
    # sizes alternate rep-by-rep and each keeps its own minimum
    N_REPS = 9

    # frames live in HBM as the (H, W) u32 view of the interleaved RGBA
    # bytes — IDENTICAL memory to an (H, W, 4) u8 array (numpy .view), and
    # the form the band kernel reads directly.  A u8-typed argument pays a
    # full-frame relayout copy (u8 lane groups -> u32 lanes, ~0.19 ms/4K,
    # xprof r3) that the reference's GPU-resident BGRA capture never pays.
    step = make_full_step(H, W, cs=Colorspace.BT709, scale=2,
                          input_format="packed")
    # the copy-free anti-hoist below relies on the pipeline fast path
    # (tm feeds the frame-reading kernel); on any other path fall back to
    # an input XOR so nothing can be hoisted out of the loop
    tm_anti_hoist = (
        getattr(step, "pipeline_static_ok", False)
        and jax.default_backend() != "cpu"
    )

    FULLRES = ("zebra", "falsecolor", "focuspeaking")

    def checksum(out):
        total = jnp.int32(0)
        for name, leaf in zip(out._fields, out):
            if name in FULLRES:
                # opaque-kernel outputs: a contiguous row-block sample keeps
                # the whole Mosaic kernel alive without a 33 MB re-read per
                # image (never lane-stride big images — costs a relayout)
                leaf = leaf[:, :64, :]
            total += jnp.sum(leaf.astype(jnp.int32))
        return total

    def make_run(n):
        @jax.jit
        def run_batch(frame):
            def body(i, acc):
                # per-iteration tm -> the frame-reading kernel is
                # loop-variant; nothing hoists (see module docstring)
                f = frame
                if not tm_anti_hoist:
                    f = jnp.bitwise_xor(f, (i % 2).astype(jnp.uint8))
                out = step(f, i.astype(jnp.float32) * 0.0667)
                return acc + checksum(out)

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        return run_batch

    run_b, run_2b = make_run(B), make_run(2 * B)

    rng = np.random.default_rng(0)
    rgba = rng.integers(0, 256, size=(H, W, 4), dtype=np.uint8)
    frames = jax.device_put(rgba.view(np.uint32).reshape(H, W))
    frames.block_until_ready()

    def timed(fn):
        t0 = time.perf_counter()
        _ = np.asarray(fn(frames))
        return time.perf_counter() - t0

    _ = np.asarray(run_b(frames))  # compile + warmup
    _ = np.asarray(run_2b(frames))
    t_b = t_2b = float("inf")
    for _ in range(N_REPS):
        t_b = min(t_b, timed(run_b))
        t_2b = min(t_2b, timed(run_2b))

    per_frame = max(t_2b - t_b, 1e-9) / B
    fps = 1.0 / per_frame

    # state-independent companion: xprof device-op-time of the exact
    # headline program.  The wall slope above is what a deployment
    # experiences, but the shared dev TPU drifts between fast/slow states
    # over minutes (observed 548-624 fps on byte-identical programs) —
    # device op time does not, so round-over-round comparisons ride this.
    device_ms = _device_ms_per_frame(jax, run_b, frames, B)

    baseline_fps = 600.0  # BASELINE.json: >10x real-time 4K60 per chip
    print(
        json.dumps(
            {
                "metric": "4K_frames_per_sec_all6_scopes_1chip",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / baseline_fps, 3),
                "device_ms_per_frame": (
                    None if device_ms is None else round(device_ms, 4)
                ),
            }
        )
    )
    print(
        f"# {fps:.1f} fps sustained ({per_frame*1e3:.3f} ms/frame, slope over "
        f"batches {B}->{2*B}: {t_b*1e3:.1f} -> {t_2b*1e3:.1f} ms), "
        f"device={jax.devices()[0]}",
        file=sys.stderr,
    )
    print(
        "# (make_full_step: overlays at full 4K, stats at target_scale=2 —"
        " the reference's default settings; see doc/performance.md for the"
        " dock-parity panel and other shapes)",
        file=sys.stderr,
    )


def _device_ms_per_frame(jax, run, frames, n):
    """xprof op-profile device time per frame of the exact headline loop
    program — the state-independent companion to the wall slope (the
    tunnel's per-dispatch cost drifts; on-chip op time does not).  Returns
    None (and says why) when profiling is unavailable rather than failing
    the benchmark record."""
    import glob
    import shutil

    trace_dir = "/tmp/ocm_bench_trace"
    try:
        shutil.rmtree(trace_dir, ignore_errors=True)
        with jax.profiler.trace(trace_dir):
            _ = np.asarray(run(frames))

        from xprof.convert import raw_to_tool_data as rtd

        data, _meta = rtd.xspace_to_tool_data(
            glob.glob(trace_dir + "/plugins/profile/*/*.xplane.pb"),
            "op_profile",
            {},
        )
        total_raw = 0.0

        def walk(node):
            nonlocal total_raw
            m = node.get("metrics", {})
            if m.get("occurrences") and not node.get("children"):
                total_raw += m.get("rawTime", 0)
            for c in node.get("children", []):
                walk(c)

        walk(json.loads(data).get("byProgram", {}))
        if total_raw <= 0:
            raise RuntimeError("op profile empty (no device events)")
        return total_raw / (n * 1e9)  # rawTime ps -> ms/frame
    except Exception as e:  # profile is best-effort evidence, never fatal
        print(f"# device-op-time profile unavailable: {e}", file=sys.stderr)
        return None
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)


def _wait_for_backend(attempts: int = 5, delay_s: float = 60.0) -> None:
    """The dev TPU rides a tunnel that occasionally refuses backend init
    ("UNAVAILABLE: TPU backend setup/compile error") or hangs device
    enumeration for minutes at a time (observed r3); probe in a bounded
    SUBPROCESS (in-process init failures can be cached by jax) and retry
    a few times so a transient outage doesn't cost the benchmark record.

    When the AMBIENT client is broken but an alternate platform name still
    reaches the chip (observed late r3: the 'axon' plugin refusing init —
    "not in the list of known backends" — while plain 'tpu' enumerates the
    same TPU v5e fine), the working alternate is exported via
    OCM_FORCE_PLATFORM for `_apply_forced_platform` to apply after import.
    """
    import os
    import subprocess

    def probe(platform=None):
        force = (
            f"jax.config.update('jax_platforms', '{platform}'); "
            if platform else ""
        )
        code = f"import jax; {force}jax.devices(); print('ok')"
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=240)
            if r.returncode == 0:
                return True, ""
            err = r.stderr.decode(errors="replace").strip().splitlines()
            return False, (err[-1] if err else "?")
        except subprocess.TimeoutExpired:
            return False, "probe timed out (240s)"

    for i in range(attempts):
        ok, err = probe()
        if ok:
            return
        # only adopt an alternate PJRT client after 2+ consecutive ambient
        # failures: the retry loop exists to wait out transient tunnel
        # outages, and switching clients on the first glitch could silently
        # change benchmark comparability
        if i >= 1:
            for alt in ("tpu",):
                if probe(alt)[0]:
                    os.environ["OCM_FORCE_PLATFORM"] = alt
                    print(f"ambient backend broken ({err}); switching to "
                          f"jax_platforms={alt}", file=sys.stderr)
                    return
        if i == attempts - 1:
            print(f"backend still unavailable: {err}", file=sys.stderr)
            return  # let main() surface the real error
        print(f"backend probe failed ({err}); retry {i + 1}/{attempts - 1} "
              f"in {delay_s:.0f}s", file=sys.stderr)
        time.sleep(delay_s)


def _apply_forced_platform(jax) -> None:
    """Apply _wait_for_backend's alternate-client choice; must run right
    after `import jax`, BEFORE any backend init (jax.devices())."""
    import os

    alt = os.environ.get("OCM_FORCE_PLATFORM")
    if alt:
        try:
            jax.config.update("jax_platforms", alt)
        except Exception as e:
            # usually "backend already initialized" (ambient worked after
            # all) — but say so: a silently ignored failure here could mean
            # the run proceeds on an unintended backend
            print(f"note: jax_platforms={alt!r} not applied ({e})",
                  file=sys.stderr)


if __name__ == "__main__":
    _wait_for_backend()
    main()
