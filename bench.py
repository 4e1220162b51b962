"""Benchmark: full-frame NeRF render throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Primary metric (per BASELINE.json): ms/frame at 640x480 for the fastest
QUALITY-GATED serving preset present:

  - TURBO (when the fixture's .turbo.npz sidecar exists): a narrow
    student (train/distill.py DEFAULT_STUDENT) distilled offline from the
    trained fixture, served proposal-guided importance-only at int8 —
    gated by scripts/validate_quality.py --proposal --fast-preset --turbo.
  - FAST otherwise: the full 8x256 fine net, proposal(2x64) coarse pass,
    full-int8 kernels, importance-only fine pass (no re-evaluation of the
    64 uniform coarse depths the reference merges in,
    …inference_handler.py:243), placement on the stride-4 ray lattice —
    gated by validate_quality.py --proposal --fast-preset
    --prop-subsample 4.

Both are timed; the reference-placement configuration (64+128=192 merged
fine samples, identical sample placement to the reference) is timed
alongside and reported as ms_per_frame_reference_placement.

Weights: a TRAINED synthetic-scene fixture (assets/bench/synth_*.npz,
scripts/make_bench_fixture.py) so early termination and int8 calibration
see realistic free space (round-2 VERDICT item 2); falls back to
boosted-density random init only if the fixture is missing.

The reference publishes no latency numbers (BASELINE.md), so vs_baseline
is reported against the north-star target of 100 ms/frame
(BASELINE.json: v4-8); values > 1.0 beat the target. mfu is the fine+
coarse matmul OPs per frame (no early termination assumed) divided by
elapsed time and the measured 374 TOP/s v5e int8 MXU peak.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

WIDTH, HEIGHT = 640, 480
TARGET_MS = 100.0
WARMUP_FRAMES = 2
TIMED_FRAMES = 5
FAST_N_IMPORTANCE = 96  # quality-gated (validate_quality.py --fast-preset)
INT8_PEAK_TOPS = 374e12  # measured v5e MXU int8 throughput (ROADMAP.md)

# Tunnel-degradation defense (round-4 VERDICT item 1): the axon tunnel's
# dispatch+fetch overhead is normally ~35-60 ms on top of device time, but
# degraded windows have been observed at 350+ ms (BENCH_r04.json recorded
# 385.51 ms wall against 35.11 ms device). If the measured overhead exceeds
# DEGRADED_OVERHEAD_MS, the timing block is re-run (compiled programs are
# reused, so a retry costs seconds) after a pause, and the best attempt
# wins; the JSON carries `attempts` and a `degraded` flag so a bad window
# can never silently become the round's number.
TUNNEL_NORM_MS = 60.0
DEGRADED_OVERHEAD_MS = 2.5 * TUNNEL_NORM_MS
MAX_TIMING_ATTEMPTS = 5
RETRY_SLEEP_S = 45.0


def is_degraded_capture(headline_ms, device_ms) -> bool:
    """True when a wall-clock capture can't be trusted as the round's
    number: the tunnel's dispatch+fetch residual dwarfs the documented
    ~35-60 ms norm (BENCH_r04 recorded 350 ms of it), or device time
    could not be read at all (an unverifiable window)."""
    if device_ms is None:
        return True
    return (headline_ms - device_ms) > DEGRADED_OVERHEAD_MS

# Weight fixtures, most-representative first: the product renders Replica
# INTERIORS (reference nerf/datasets/replica_dataset.py:25-39), so the
# room-walkthrough fixture is the headline content when present
# (make_bench_fixture.py --scene room; round-4 VERDICT item 3 — interiors
# measurably behave differently from the free-floating orbit scene); the
# legacy orbit fixture is the fallback.
_BENCH_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "assets", "bench"
)
_FIXTURE_CANDIDATES = (
    os.path.join(_BENCH_DIR, "room_proposal.npz"),
    os.path.join(_BENCH_DIR, "synth_proposal.npz"),
)
FIXTURE = next(
    (p for p in _FIXTURE_CANDIDATES if os.path.exists(p)),
    _FIXTURE_CANDIDATES[1],
)


def _per_sample_macs(spec) -> int:
    """int8 matmul MACs per (ray, sample) MLP evaluation in the fused
    kernel layout (ops/pallas_render.py): padded-enc trunk + skip + fused
    feature/alpha head + view layer + rgb head."""
    enc = -(-(spec.input_ch) // 8) * 8  # padded encoding rows (63 -> 64)
    width = spec.width
    fa_rows = -(-(width + 8) // 128) * 128
    macs = enc * width  # layer 0
    for i in range(1, spec.depth):
        macs += width * width
        if (i - 1) in spec.skips:
            macs += enc * width
    macs += width * fa_rows  # feature+alpha fused head
    macs += width * (width // 2)  # view layer (hv)
    macs += (width // 2) * 8  # rgb head (8 rows, 3 live)
    return macs


def _frame_tops(fine_spec, prop_spec, n_coarse, n_fine) -> float:
    """Nominal matmul OPs (2*MACs) for one 640x480 frame, no ET."""
    rays = WIDTH * HEIGHT
    macs = rays * (
        n_coarse * _per_sample_macs(prop_spec)
        + n_fine * _per_sample_macs(fine_spec)
    )
    return 2.0 * macs / 1e12


def _load_params():
    """Trained fixture if present; boosted-density random init otherwise."""
    from nerf_workspaces_explorer_tpu.infer.checkpoint import load_checkpoint
    from nerf_workspaces_explorer_tpu.models import NerfMLPSpec, init_nerf_params
    from nerf_workspaces_explorer_tpu.render.proposal import proposal_spec

    if os.path.exists(FIXTURE):
        params, _, _, meta = load_checkpoint(FIXTURE)
        scene = meta.get("scene", "synthetic")
        return (
            params,
            tuple(meta.get("depth_range", (0.1, 6.0))),
            f"trained-{scene}",
        )
    spec = NerfMLPSpec()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "proposal": init_nerf_params(k1, proposal_spec()),
        "fine": init_nerf_params(k2, spec),
    }
    for p in params.values():
        p["alpha"]["b"] = p["alpha"]["b"] + 2.0
    return params, (0.1, 10.0), "random-init"


def _time_renderer(renderer, pose) -> float:
    for _ in range(WARMUP_FRAMES):
        np.asarray(renderer.render_pose_uint8(pose))
    start = time.perf_counter()
    for _ in range(TIMED_FRAMES):
        np.asarray(renderer.render_pose_uint8(pose))
    return (time.perf_counter() - start) / TIMED_FRAMES * 1000.0


def _device_ms(renderer, pose, n: int = 10) -> float:
    """Whole-frame DEVICE time: enqueue `n` scalar-reduced frames, then one
    float() fetch to drain the in-order queue (CLAUDE.md timing protocol —
    through the axon tunnel `block_until_ready` acks enqueue, and the uint8
    frame fetch costs ~30 ms that is tunnel transfer, not device work).
    This is the number MFU should be judged against; headline_ms - device_ms
    is dispatch + fetch overhead the tunnel adds (round-3 VERDICT item 3)."""
    import jax.numpy as jnp

    body = renderer._frozen_batch_body()
    pose_j = jnp.asarray(pose, dtype=jnp.float32)

    @jax.jit
    def frame_device(p, c2w):
        return body(p, c2w[None]).sum()

    float(frame_device(renderer._params, pose_j))  # compile + drain
    start = time.perf_counter()
    out = None
    for _ in range(n):
        out = frame_device(renderer._params, pose_j)
    float(out)
    return (time.perf_counter() - start) / n * 1000.0


def _turbo_stage_split(sidecar: str, depth_range) -> dict:
    """Per-stage device-time split of the turbo frame at the benchmarked
    config (proposal coarse density -> fused importance sampling -> fine
    pass), same enqueue-N/drain-once protocol as `_device_ms`. Mirrors
    scripts/profile_turbo_frame.py but rides the driver artifact so a kernel
    regression is distinguishable from tunnel noise (round-3 VERDICT)."""
    import jax.numpy as jnp

    from nerf_workspaces_explorer_tpu.ops.pallas_render import (
        _dists_from_z,
        encode_viewdirs_kernel_order,
        nerf_render_pallas,
        prepare_kernel_params,
        ray_phase_vectors,
    )
    from nerf_workspaces_explorer_tpu.ops.pallas_sampling import (
        importance_merge_pallas,
    )
    from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_model_quant
    from nerf_workspaces_explorer_tpu.rays import create_rays
    from nerf_workspaces_explorer_tpu.rays.sampling import coarse_z_vals
    from nerf_workspaces_explorer_tpu.render.proposal import proposal_spec
    from nerf_workspaces_explorer_tpu.train.distill import (
        load_turbo_checkpoint,
        read_turbo_metadata,
        student_spec_from_meta,
    )

    params, _ = load_turbo_checkpoint(sidecar)
    spec, student = student_spec_from_meta(read_turbo_metadata(sidecar))
    n_coarse = int(student.get("n_samples", 64))
    n_imp = int(student["n_importance"])
    sub = max(1, int(student.get("proposal_subsample", 1)))
    near, far = depth_range

    quant = calibrate_model_quant(params, spec)
    kp_p = prepare_kernel_params(
        params["proposal"],
        proposal_spec(int(student.get("proposal_num_freqs", 6))),
        quant=quant.get("proposal"),
    )
    kp_f = prepare_kernel_params(params["fine"], spec, quant=quant["fine"])

    rays = create_rays(
        jnp.eye(4)[None], HEIGHT, WIDTH, 320.0, 320.0, WIDTH / 2 - 0.5,
        HEIGHT / 2 - 0.5, near, far,
    ).reshape(HEIGHT * WIDTH)
    origins = rays.origins.astype(jnp.float32)
    dirs = rays.dirs.astype(jnp.float32)
    dir_norm = jnp.linalg.norm(dirs, axis=-1)[None, :]
    venc = encode_viewdirs_kernel_order(
        rays.viewdirs.astype(jnp.float32), num_freqs=kp_f.view_freqs
    )
    o_ph_p, d_ph_p = ray_phase_vectors(origins, dirs, kp_p.pts_freqs)
    o_ph_f, d_ph_f = ray_phase_vectors(origins, dirs, kp_f.pts_freqs)
    # Proposal/importance run on the strided placement lattice the serving
    # path uses (every `sub`th ray per axis); fine runs on all rays.
    lat = (
        jnp.arange(HEIGHT * WIDTH)
        .reshape(HEIGHT, WIDTH)[::sub, ::sub]
        .reshape(-1)
    )
    z_c = coarse_z_vals(
        rays.near.astype(jnp.float32)[lat], rays.far.astype(jnp.float32)[lat],
        n_coarse,
    ).T

    def timed(fn, *args, n=10):
        out = fn(*args)
        float(out.ravel()[0]) if out.ndim else float(out)
        start = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(out.ravel()[0]) if out.ndim else float(out)
        return (time.perf_counter() - start) / n * 1000.0

    @jax.jit
    def proposal_sum(z):
        return nerf_render_pallas(
            kp_p, o_ph_p[:, lat], d_ph_p[:, lat], z,
            _dists_from_z(z, dir_norm[:, lat]), density_only=True,
            early_stop_eps=1e-3,
        ).sum()

    @jax.jit
    def importance_only(wts, z):
        return importance_merge_pallas(wts, z, n_imp, ray_tile=256, merge=False)

    @jax.jit
    def importance_sum(wts, z):
        return importance_only(wts, z).sum()

    @jax.jit
    def proposal_wts(z):
        return nerf_render_pallas(
            kp_p, o_ph_p[:, lat], d_ph_p[:, lat], z,
            _dists_from_z(z, dir_norm[:, lat]), density_only=True,
            early_stop_eps=1e-3,
        )

    wts = proposal_wts(z_c)
    z_fine_lat = importance_only(wts, z_c)
    # Broadcast lattice z back to all rays (nearest lattice site), matching
    # the serving path's placement-broadcast shape for the fine pass.
    rows = (jnp.arange(HEIGHT) // sub) * ((WIDTH + sub - 1) // sub)
    cols = jnp.arange(WIDTH) // sub
    full_idx = (rows[:, None] + cols[None, :]).reshape(-1)
    z_fine = z_fine_lat[:, full_idx]

    @jax.jit
    def fine_sum(z):
        return nerf_render_pallas(
            kp_f, o_ph_f, d_ph_f, z, _dists_from_z(z, dir_norm), venc,
            early_stop_eps=1e-3,
        ).sum()

    return {
        "proposal": round(timed(proposal_sum, z_c), 2),
        "importance": round(timed(importance_sum, wts, z_c), 2),
        "fine": round(timed(fine_sum, z_fine), 2),
    }


def main() -> None:
    from nerf_workspaces_explorer_tpu.camera.poses import poses_from_coordinates
    from nerf_workspaces_explorer_tpu.core import COORD
    from nerf_workspaces_explorer_tpu.core.config import (
        ExperimentConfig,
        FrameworkConfig,
        RenderingConfig,
    )
    from nerf_workspaces_explorer_tpu.infer.renderer import NeRFRenderer
    from nerf_workspaces_explorer_tpu.models import NerfMLPSpec
    from nerf_workspaces_explorer_tpu.render.proposal import proposal_spec

    params, depth_range, weights_kind = _load_params()
    config = FrameworkConfig(
        experiment=ExperimentConfig(image_width=WIDTH, image_height=HEIGHT),
        rendering=RenderingConfig(depth_range=depth_range),
    )
    use_pallas = jax.devices()[0].platform != "cpu"
    precision = "int8" if use_pallas else "fast"

    def build(preset: str, n_importance=None) -> NeRFRenderer:
        r = NeRFRenderer(
            "office_tokyo", None, config=config, precision=precision,
            use_pallas=use_pallas, use_proposal=True, preset=preset,
            n_importance=n_importance,
        )
        r.set_params(params)
        return r

    # FAST serving preset: importance-only fine pass (quality-gated).
    fast = build("fast", FAST_N_IMPORTANCE)
    # Reference placement: merged 64+128=192 fine samples.
    ref = build("reference")

    pose = poses_from_coordinates(
        COORD(x=1.0, y=-0.5, z=0.5, pitch=-90.0), [COORD(yaw=-30.0)]
    )[0]

    # TURBO preset: distilled narrow student, when its sidecar fixture
    # exists next to the trained teacher fixture.
    from nerf_workspaces_explorer_tpu.train.distill import (
        read_turbo_metadata,
        student_spec_from_meta,
        turbo_sidecar_path,
    )

    sidecar = turbo_sidecar_path(FIXTURE)
    turbo = turbo_student = turbo_spec = None
    if weights_kind.startswith("trained") and os.path.exists(sidecar):
        turbo = NeRFRenderer(
            "office_tokyo", FIXTURE, config=config, precision=precision,
            use_pallas=use_pallas, preset="turbo",
        )
        turbo.initialize_models()
        turbo_spec, turbo_student = student_spec_from_meta(
            read_turbo_metadata(sidecar)
        )

    if turbo is not None:
        headline = turbo
        preset_name = "turbo"
        n_coarse = int(turbo_student["n_samples"])
        n_fine = int(turbo_student["n_importance"])
        fine_spec = turbo_spec
    else:
        headline = fast
        preset_name = "fast"
        n_coarse, n_fine = 64, FAST_N_IMPORTANCE
        fine_spec = NerfMLPSpec()

    # Product-config frame (BASELINE.md north star: <100 ms for the
    # 320x240 office view, stated for a v4-8; this is ONE v5e chip):
    # the same headline preset at the reference's shipped resolution.
    config320 = FrameworkConfig(
        experiment=ExperimentConfig(image_width=320, image_height=240),
        rendering=RenderingConfig(depth_range=depth_range),
    )
    if turbo is not None:
        r320 = NeRFRenderer(
            "office_tokyo", FIXTURE, config=config320, precision=precision,
            use_pallas=use_pallas, preset="turbo",
        )
        r320.initialize_models()
    else:
        r320 = NeRFRenderer(
            "office_tokyo", None, config=config320, precision=precision,
            use_pallas=use_pallas, use_proposal=True, preset="fast",
            n_importance=FAST_N_IMPORTANCE,
        )
        r320.set_params(params)

    tour = poses_from_coordinates(
        COORD(x=1.0, y=-0.5, z=0.5, pitch=-90.0),
        [COORD(yaw=a) for a in np.linspace(-90.0, 90.0, 8)],
    )

    def _measure_once() -> dict:
        """One full wall-clock timing pass over every preset (compiled
        programs are reused after the first pass, so re-runs cost seconds)
        plus a device-time read for the headline preset. Diagnostics must
        never take down the artifact, so device-time failure degrades to
        None rather than raising."""
        t = {
            "ms_fast": _time_renderer(fast, pose),
            "ms_ref": _time_renderer(ref, pose),
            "ms_turbo": (
                _time_renderer(turbo, pose) if turbo is not None else None
            ),
            "ms_320": _time_renderer(r320, pose),
        }
        # Tour/video throughput on the headline preset: the pipelined
        # stream overlaps device compute with the host download.
        start = time.perf_counter()
        n_streamed = sum(
            1 for _ in headline.render_poses_uint8_stream(tour, lookahead=3)
        )
        t["ms_streamed"] = (time.perf_counter() - start) / n_streamed * 1000.0
        t["headline_ms"] = t["ms_turbo"] if turbo is not None else t["ms_fast"]
        try:
            t["device_ms"] = _device_ms(headline, pose)
        except Exception as exc:  # noqa: BLE001
            print(f"(device-time accounting failed: {exc!r})", file=sys.stderr)
            t["device_ms"] = None
        return t

    def _is_degraded(t: dict) -> bool:
        return is_degraded_capture(t["headline_ms"], t["device_ms"])

    best = None
    attempts = 0
    for attempt in range(MAX_TIMING_ATTEMPTS):
        attempts += 1
        t = _measure_once()
        if best is None or t["headline_ms"] < best["headline_ms"]:
            best = t
        if not _is_degraded(best):
            break
        print(
            f"(degraded capture on attempt {attempts}: headline "
            f"{t['headline_ms']:.1f} ms vs device {t['device_ms']} ms; "
            f"retrying after {RETRY_SLEEP_S:.0f}s)",
            file=sys.stderr,
        )
        if attempt < MAX_TIMING_ATTEMPTS - 1:
            time.sleep(RETRY_SLEEP_S)
    degraded = _is_degraded(best)

    headline_ms = best["headline_ms"]
    ms_fast, ms_ref = best["ms_fast"], best["ms_ref"]
    ms_turbo, ms_320 = best["ms_turbo"], best["ms_320"]
    ms_streamed, device_ms = best["ms_streamed"], best["device_ms"]

    rays_per_sec = WIDTH * HEIGHT / (headline_ms / 1000.0)
    n_chips = jax.device_count()

    tops = _frame_tops(fine_spec, proposal_spec(), n_coarse, n_fine)
    ms_floor_no_et = tops * 1e12 / INT8_PEAK_TOPS * 1000.0
    mfu = tops * 1e12 / (headline_ms / 1000.0) / INT8_PEAK_TOPS

    mfu_device = dispatch_fetch_ms = None
    if device_ms is not None:
        mfu_device = tops * 1e12 / (device_ms / 1000.0) / INT8_PEAK_TOPS
        dispatch_fetch_ms = max(0.0, headline_ms - device_ms)

    # Per-stage device-time split at the headline turbo config (round-3
    # VERDICT item 3), retried on transient tunnel/transport errors
    # (round-4's split died on a `remote_compile: read body` error).
    stage_ms = None
    if ms_turbo is not None:
        for split_attempt in range(3):
            try:
                stage_ms = _turbo_stage_split(sidecar, depth_range)
                break
            except Exception as exc:  # noqa: BLE001
                print(
                    f"(stage split attempt {split_attempt + 1} failed:"
                    f" {exc!r})",
                    file=sys.stderr,
                )
                if split_attempt < 2:
                    time.sleep(RETRY_SLEEP_S)

    # Training throughput at the shipped office config (1024 rays/step,
    # 64+128 samples, full 8x256 coarse+fine with backward + Adam).
    train_steps_per_sec = _bench_train_step()
    train_steps_per_sec_fused = _bench_train_step(field_impl="pallas")

    print(
        json.dumps(
            {
                "metric": "ms_per_frame_640x480",
                "value": round(headline_ms, 2),
                "unit": "ms",
                "vs_baseline": round(TARGET_MS / headline_ms, 4),
                "vs_baseline_reference_placement": round(TARGET_MS / ms_ref, 4),
                "preset": preset_name,
                "attempts": attempts,
                "degraded": degraded,
                "device_ms": (
                    round(device_ms, 2) if device_ms is not None else None
                ),
                "dispatch_fetch_ms_est": (
                    round(dispatch_fetch_ms, 2)
                    if dispatch_fetch_ms is not None else None
                ),
                "mfu_device": (
                    round(mfu_device, 4) if mfu_device is not None else None
                ),
                "stage_ms": stage_ms,
                "ms_per_frame_fast_preset": round(ms_fast, 2),
                "ms_per_frame_turbo": (
                    round(ms_turbo, 2) if ms_turbo is not None else None
                ),
                "ms_per_frame_reference_placement": round(ms_ref, 2),
                "ms_per_frame_320x240_product_config": round(ms_320, 2),
                "ms_per_frame_streamed": round(ms_streamed, 2),
                "rays_per_sec_per_chip": round(rays_per_sec / n_chips),
                "mfu": round(mfu, 4),
                "ms_floor_no_et": round(ms_floor_no_et, 2),
                "train_steps_per_sec": round(train_steps_per_sec, 2),
                "train_steps_per_sec_fused": round(train_steps_per_sec_fused, 2),
                "n_chips": n_chips,
                "samples_per_ray": n_fine,
                "samples_per_ray_reference_placement": 64 + 128,
                "fine_net": (
                    f"{fine_spec.depth}x{fine_spec.width}"
                ),
                "coarse_net": "proposal-2x64",
                "precision": precision,
                "weights": weights_kind,
                "device": str(jax.devices()[0].device_kind),
            }
        )
    )


def _bench_train_step(n_steps: int = 30, field_impl: str = "xla") -> float:
    import jax.numpy as jnp

    from nerf_workspaces_explorer_tpu.models import NerfMLPSpec
    from nerf_workspaces_explorer_tpu.rays import create_rays
    from nerf_workspaces_explorer_tpu.render import RenderSettings
    from nerf_workspaces_explorer_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    spec = NerfMLPSpec()
    settings = RenderSettings()  # office config
    optimizer = make_optimizer()
    state = init_train_state(jax.random.PRNGKey(0), spec, optimizer)
    poses = jnp.stack([jnp.eye(4)] * 4)
    rays = create_rays(poses, 240, 320, 160.0, 160.0, 159.5, 119.5, 0.1, 10.0)
    rgbs = jax.random.uniform(jax.random.PRNGKey(1), (4, 240 * 320, 3))
    step = make_train_step(settings, spec, optimizer, n_rays=1024, field_impl=field_impl)
    key = jax.random.PRNGKey(2)
    state, metrics = step(state, rays, rgbs, key)  # compile
    float(metrics["total_loss"])
    start = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, rays, rgbs, key)
    float(metrics["total_loss"])
    return n_steps / (time.perf_counter() - start)


if __name__ == "__main__":
    main()
