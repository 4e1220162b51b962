"""Tests for the fused Pallas render kernel (interpret mode on CPU).

The kernel's numerical contract: identical math to the jnp reference
pipeline (render_ray_bundle with eval settings) up to bf16 weight rounding.
On-TPU performance is covered by bench.py; these tests pin correctness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_workspaces_explorer_tpu.models import NerfMLPSpec, init_nerf_params
from nerf_workspaces_explorer_tpu.models.encoding import positional_encoding
from nerf_workspaces_explorer_tpu.ops.pallas_render import (
    VIEW_ENC_DIM,
    _encoding_permutation,
    encode_viewdirs_kernel_order,
    prepare_kernel_params,
    ray_phase_vectors,
    render_rays_fused,
)
from nerf_workspaces_explorer_tpu.rays import create_rays
from nerf_workspaces_explorer_tpu.render import RenderSettings, render_ray_bundle

SPEC = NerfMLPSpec()


@pytest.fixture(scope="module")
def params():
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    p = {"coarse": init_nerf_params(k1, SPEC), "fine": init_nerf_params(k2, SPEC)}
    for net in p.values():
        net["alpha"]["b"] = net["alpha"]["b"] + 1.5  # visible density
    return p


def test_encoding_permutation_is_bijective():
    perm = _encoding_permutation(10, 64)
    live = perm[perm >= 0]
    assert len(live) == 63 and len(set(live.tolist())) == 63
    assert sorted(live.tolist()) == list(range(63))


def test_ray_phase_vectors_reproduce_encoding():
    """o_ph + z*d_ph must reproduce positional_encoding of o + z*d (via the
    kernel's sin-with-bias evaluation), modulo the row permutation."""
    rng = np.random.default_rng(0)
    origins = jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
    z = jnp.asarray(rng.uniform(0.5, 5.0, size=(5,)), dtype=jnp.float32)

    o_ph, d_ph = ray_phase_vectors(origins, dirs)
    phases = o_ph + z[None, :] * d_ph  # [64, 5]
    row = np.arange(64)[:, None]
    feat_kernel = np.where(
        row < 3,
        np.asarray(phases),
        np.where(row < 63, np.sin(np.asarray(phases)), 0.0),
    )

    pts = origins + z[:, None] * dirs
    ref = np.asarray(positional_encoding(pts, 10, scalar_factor=10.0))  # [5, 63]
    perm = _encoding_permutation(10, 64)
    for kernel_row, ref_row in enumerate(perm):
        if ref_row >= 0:
            # fp32 re-association of (o + z d)/10 * 2^k vs o_ph + z d_ph
            # costs a few 1e-5 at the highest frequencies.
            np.testing.assert_allclose(
                feat_kernel[kernel_row], ref[:, ref_row], atol=1e-4
            )


def test_sincos_poly_matches_transcendental():
    """The quadrant-reduced polynomial sin/cos pair must stay within a few
    fp32 ulps of the libm values over the kernel's phase range (base phases
    are coord/scalar_factor, |p| << 4), so the octave-doubling ladder built
    on it is numerically identical to one built on jnp.sin/jnp.cos."""
    from nerf_workspaces_explorer_tpu.ops.pallas_render import _sincos_poly

    rng = np.random.default_rng(7)
    p = jnp.asarray(rng.uniform(-4.0, 4.0, size=(4096,)), dtype=jnp.float32)
    s, c = jax.jit(_sincos_poly)(p)
    p64 = np.asarray(p, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(s), np.sin(p64), atol=2e-7)
    np.testing.assert_allclose(np.asarray(c), np.cos(p64), atol=2e-7)
    # exact at the quadrant boundaries (q*pi/2 rounding edges)
    edges = jnp.asarray(
        np.arange(-5, 6) * np.pi / 2.0 + 1e-7, dtype=jnp.float32
    )
    se, ce = jax.jit(_sincos_poly)(edges)
    np.testing.assert_allclose(
        np.asarray(se), np.sin(np.asarray(edges, np.float64)), atol=2e-7
    )
    np.testing.assert_allclose(
        np.asarray(ce), np.cos(np.asarray(edges, np.float64)), atol=2e-7
    )


def test_viewdir_encoding_kernel_order():
    rng = np.random.default_rng(1)
    vd = rng.normal(size=(7, 3))
    vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
    vd = jnp.asarray(vd, dtype=jnp.float32)
    venc = np.asarray(encode_viewdirs_kernel_order(vd, dtype=jnp.float32))
    assert venc.shape == (VIEW_ENC_DIM, 7)
    ref = np.asarray(positional_encoding(vd, 4, scalar_factor=1.0))
    perm = _encoding_permutation(4, VIEW_ENC_DIM)
    for kernel_row, ref_row in enumerate(perm):
        expected = ref[:, ref_row] if ref_row >= 0 else 0.0
        np.testing.assert_allclose(venc[kernel_row], expected, atol=1e-5)


def test_prepare_kernel_params_shapes(params):
    kp = prepare_kernel_params(params["fine"], SPEC)
    assert len(kp.w_layers) == 8
    assert kp.w_layers[0].shape == (256, 64)
    assert kp.w_layers[5].shape == (256, 256)  # h part of the skip layer
    assert len(kp.w_skip_enc) == 1 and kp.w_skip_enc[0].shape == (256, 64)
    assert kp.w_fa.shape == (384, 256)
    assert kp.w_view_h.shape == (128, 256)
    assert kp.w_view_enc.shape == (128, 32)
    assert kp.w_rgb.shape == (8, 128)


def test_fused_render_matches_reference_pipeline(params):
    settings = RenderSettings(n_samples=16, n_importance=16)
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    rgb_fused = np.asarray(
        render_rays_fused(params, rays, settings, spec=SPEC, ray_tile=128, interpret=True)
    )
    ref = render_ray_bundle(
        params, rays, settings.for_eval(), spec=SPEC, full_outputs=False
    )
    np.testing.assert_allclose(
        rgb_fused, np.asarray(ref["rgb_fine"]), atol=5e-3
    )  # bf16 weight rounding


def test_fused_render_ray_padding(params):
    # 100 rays with tile 64 forces zero-padding of the ray axis.
    settings = RenderSettings(n_samples=8, n_importance=8)
    rays = create_rays(jnp.eye(4)[None], 10, 10, 5.0, 5.0, 4.5, 4.5, 0.5, 4.0).reshape(100)
    rgb = np.asarray(
        render_rays_fused(params, rays, settings, spec=SPEC, ray_tile=64, interpret=True)
    )
    assert rgb.shape == (100, 3)
    assert np.all(np.isfinite(rgb))
    ref = render_ray_bundle(params, rays, settings.for_eval(), spec=SPEC, full_outputs=False)
    np.testing.assert_allclose(rgb, np.asarray(ref["rgb_fine"]), atol=5e-3)


def test_fused_render_full_outputs(params):
    settings = RenderSettings(n_samples=8, n_importance=8)
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    out = render_rays_fused(
        params, rays, settings, spec=SPEC, ray_tile=128, interpret=True, full=True
    )
    ref = render_ray_bundle(params, rays, settings.for_eval(), spec=SPEC, full_outputs=True)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref["depth_fine"]), atol=5e-2)
    np.testing.assert_allclose(np.asarray(out.acc), np.asarray(ref["acc_fine"]), atol=5e-3)


def test_early_termination_matches_no_termination(params):
    """With opaque content, early-stopped renders must match the untruncated
    render to ~eps; with eps=0 the feature is off entirely."""
    settings = RenderSettings(n_samples=16, n_importance=16)
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    # Saturating density: boost alpha bias so transmittance collapses early.
    hot = jax.tree.map(lambda x: x, params)
    for net in hot.values():
        net["alpha"]["b"] = net["alpha"]["b"] + 6.0
    rgb_stop = np.asarray(render_rays_fused(
        hot, rays, settings, spec=SPEC, ray_tile=128, interpret=True, early_stop_eps=1e-4
    ))
    rgb_full = np.asarray(render_rays_fused(
        hot, rays, settings, spec=SPEC, ray_tile=128, interpret=True, early_stop_eps=0.0
    ))
    np.testing.assert_allclose(rgb_stop, rgb_full, atol=2e-4)


def test_et_check_every_chunking_is_exact(params):
    """Intra-group ET chunks (et_check_every < samples_per_step) must match
    the per-group default to ~eps: the skip bound is granularity-independent.
    (Chunking measured SLOWER on the TPU — see the nerf_render_pallas note —
    but the knob's numerics are pinned here.)"""
    from nerf_workspaces_explorer_tpu.ops.pallas_render import (
        _dists_from_z,
        nerf_render_pallas,
    )
    from nerf_workspaces_explorer_tpu.rays.sampling import coarse_z_vals

    hot = jax.tree.map(lambda x: x, params)
    hot["fine"]["alpha"]["b"] = hot["fine"]["alpha"]["b"] + 6.0  # saturate
    kp = prepare_kernel_params(hot["fine"], SPEC)
    rays = create_rays(
        jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0
    ).reshape(128)
    origins = rays.origins.astype(jnp.float32)
    dirs = rays.dirs.astype(jnp.float32)
    dir_norm = jnp.linalg.norm(dirs, axis=-1)[None, :]
    o_ph, d_ph = ray_phase_vectors(origins, dirs, kp.pts_freqs)
    venc = encode_viewdirs_kernel_order(rays.viewdirs.astype(jnp.float32))
    z = coarse_z_vals(rays.near.astype(jnp.float32),
                      rays.far.astype(jnp.float32), 16).T
    dists = _dists_from_z(z, dir_norm)

    def run(**kw):
        return np.asarray(
            nerf_render_pallas(
                kp, o_ph, d_ph, z, dists, venc, ray_tile=128,
                samples_per_step=16, early_stop_eps=1e-4, interpret=True,
                **kw,
            )
        )

    base = run()  # default: one check per 16-sample group
    for chunk in (4, 8):
        np.testing.assert_allclose(
            run(et_check_every=chunk), base, atol=2e-4
        )
    # Non-divisor request falls back to the largest divisor; still exact.
    np.testing.assert_allclose(run(et_check_every=5), base, atol=2e-4)


def test_int8_trunk_matches_fp32_pipeline(params):
    """int8 serving mode (ops/quantize.py): the quantized trunk must stay
    within a visually-lossless budget of the fp32 jnp pipeline (the bench
    config gates fused-vs-jnp SSIM >= 0.99 on top of this)."""
    from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_model_quant

    settings = RenderSettings(n_samples=16, n_importance=16)
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    quant = calibrate_model_quant(params, SPEC, box=4.0, heads=False)
    assert set(quant) == {"coarse", "fine"}
    assert len(quant["fine"].h_max) == SPEC.depth - 1
    assert len(quant["fine"].w_max) == SPEC.depth

    rgb_q = np.asarray(render_rays_fused(
        params, rays, settings, spec=SPEC, ray_tile=128, interpret=True,
        quant=quant,
    ))
    ref = render_ray_bundle(
        params, rays, settings.for_eval(), spec=SPEC, full_outputs=False
    )
    rgb_ref = np.asarray(ref["rgb_fine"])
    assert rgb_q.shape == (128, 3) and np.all(np.isfinite(rgb_q))
    err = np.abs(rgb_q - rgb_ref)
    # Per-tensor int8 trunk: mean error well under a uint8 step, worst
    # pixel within a few steps.
    assert err.mean() < 2e-3, err.mean()
    assert err.max() < 3e-2, err.max()


def test_int8_survives_dead_preskip_layer(params):
    """A trunk layer that never fires on the calibration batch (all-zero
    post-ReLU — observed on a room-interior checkpoint whose pre-skip layer
    is dead on box points) must not wreck the requant chain: the percentile
    is taken over the nonzero support, a fully dead layer's unit anchors at
    the encode-feature unit, the skip-match shift stays in range (no
    saturation warning), and the int8 render stays within budget of bf16."""
    import copy
    import warnings

    from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_model_quant

    dead = copy.deepcopy(params)
    for net in dead.values():
        # Kill the pre-skip layer (output concats with the encode skip):
        # large negative bias -> ReLU zero everywhere.
        layer = SPEC.skips[0]
        net["pts"][layer]["b"] = net["pts"][layer]["b"] - 100.0

    quant = calibrate_model_quant(dead, SPEC, box=4.0, heads=False)
    assert quant["fine"].h_max[SPEC.skips[0]] == 0.0  # calibration says dead
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the old chain warned + saturated
        kp = prepare_kernel_params(dead["fine"], SPEC, quant=quant["fine"])
    assert all(-8 <= j <= 8 for j in kp.skip_shift), kp.skip_shift

    settings = RenderSettings(n_samples=16, n_importance=16)
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    rgb_q = np.asarray(render_rays_fused(
        dead, rays, settings, spec=SPEC, ray_tile=128, interpret=True,
        quant=quant,
    ))
    ref = render_ray_bundle(
        dead, rays, settings.for_eval(), spec=SPEC, full_outputs=False
    )
    err = np.abs(rgb_q - np.asarray(ref["rgb_fine"]))
    assert np.all(np.isfinite(rgb_q))
    assert err.mean() < 2e-3, err.mean()
    assert err.max() < 3e-2, err.max()


def test_int8_quant_scales_are_static_floats(params):
    from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_trunk

    q = calibrate_trunk(params["fine"], SPEC, heads=False)
    assert isinstance(q.feat_max, float)
    assert all(isinstance(v, float) for v in q.h_max + q.w_max + q.skip_w_max)
    assert not q.int8_heads
    kp = prepare_kernel_params(params["fine"], SPEC, quant=q)
    assert all(w.dtype == jnp.int8 for w in kp.w_layers)
    assert all(w.dtype == jnp.int8 for w in kp.w_skip_enc)
    assert all(b.dtype == jnp.int32 for b in kp.b_layers)
    assert kp.w_fa.dtype == jnp.bfloat16  # trunk-only mode: heads stay bf16
    assert len(kp.shift_layers) == SPEC.depth
    assert all(isinstance(s, int) and s >= 0 for s in kp.shift_layers)


def test_calibration_percentile_and_pts(params):
    """Percentile calibration (the serving default) must yield tighter
    (or equal) activation maxima than exact-max, identical weight maxima,
    and accept caller-provided real scene points."""
    import numpy as np

    from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_trunk

    exact = calibrate_trunk(params["fine"], SPEC, box=4.0, percentile=None)
    clipped = calibrate_trunk(params["fine"], SPEC, box=4.0, percentile=99.5)
    assert clipped.w_max == exact.w_max  # weights never percentile-clip
    assert clipped.skip_w_max == exact.skip_w_max
    assert all(c <= e for c, e in zip(clipped.h_max, exact.h_max))
    assert clipped.h_last_max <= exact.h_last_max
    assert clipped.feature_max <= exact.feature_max

    pts = np.random.default_rng(1).uniform(-2, 2, size=(512, 3))
    real = calibrate_trunk(params["fine"], SPEC, pts=pts)
    assert real.w_max == exact.w_max
    assert all(np.isfinite(v) and v > 0 for v in real.h_max)


def test_balanced_requant_bounds():
    """_balanced_requant: the activation unit must cover the calibrated
    target (no clipping), weights must never clip (unit >= w_max/127), and
    the worst-case resolution loss on either side is sqrt(2), not the 2x a
    plain ceil(log2) shift costs."""
    import itertools
    import math

    from nerf_workspaces_explorer_tpu.ops.pallas_render import _balanced_requant

    sqrt2 = math.sqrt(2.0) + 1e-12
    for w_unit, in_unit, target in itertools.product(
        [1e-4, 3.7e-3, 0.11, 1.0], [1e-3, 0.42, 2.0], [1e-4, 9e-3, 0.3, 5.0, 77.0]
    ):
        unit, k = _balanced_requant(w_unit, in_unit, target)
        assert isinstance(k, int) and k >= 0
        assert unit >= w_unit - 1e-15  # weights never clip
        assert unit / w_unit <= sqrt2  # bounded weight-resolution loss
        h_unit = unit * in_unit * 2.0**k
        if target >= w_unit * in_unit:  # reachable target
            assert h_unit >= target * (1.0 - 1e-12)  # activations never clip
            assert h_unit / target <= sqrt2  # bounded activation loss
        else:
            # Unreachable (k=0 is already the finest unit): exact raw scale.
            assert k == 0 and unit == w_unit


def test_int8_head_params_and_statics(params):
    """Full-int8 serving (the heads=True default): head weights quantize to
    int8, head biases to int32, and every requant constant is a static
    Python number (so it bakes into the kernel compile)."""
    from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_trunk

    q = calibrate_trunk(params["fine"], SPEC)
    assert q.int8_heads
    for v in (q.h_last_max, q.feature_max, q.hv_max, q.w_feat_max,
              q.w_alpha_max, q.w_view_h_max, q.w_rgb_max):
        assert isinstance(v, float) and v > 0.0
    kp = prepare_kernel_params(params["fine"], SPEC, quant=q)
    assert kp.int8_heads
    assert kp.w_fa.dtype == jnp.int8
    assert kp.b_fa.dtype == jnp.int32
    assert kp.w_view_h.dtype == jnp.int8
    assert kp.w_rgb.dtype == jnp.int8
    assert kp.w_view_enc.dtype == jnp.bfloat16  # per-ray, stays bf16
    assert kp.b_view.dtype == jnp.float32
    assert kp.b_rgb.dtype == jnp.float32
    assert isinstance(kp.k_feat, int) and isinstance(kp.k_hv, int)
    for s in (kp.s_alpha, kp.inv_s_view, kp.s_rgb):
        assert isinstance(s, float) and s > 0.0
    # The trunk's LAST layer now requantizes to int8 too (for the fa dot).
    assert len(kp.shift_layers) == SPEC.depth


def test_int8_full_pipeline_matches_fp32(params):
    """End-to-end int8 (trunk + heads) vs the fp32 jnp pipeline: the error
    budget is the same visually-lossless bar as the trunk-only mode (the
    bench config additionally gates SSIM >= 0.99 on trained scenes)."""
    from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_model_quant

    settings = RenderSettings(n_samples=16, n_importance=16)
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    quant = calibrate_model_quant(params, SPEC, box=4.0)
    assert all(q.int8_heads for q in quant.values())
    rgb_q = np.asarray(render_rays_fused(
        params, rays, settings, spec=SPEC, ray_tile=128, interpret=True,
        quant=quant,
    ))
    ref = render_ray_bundle(
        params, rays, settings.for_eval(), spec=SPEC, full_outputs=False
    )
    rgb_ref = np.asarray(ref["rgb_fine"])
    assert rgb_q.shape == (128, 3) and np.all(np.isfinite(rgb_q))
    err = np.abs(rgb_q - rgb_ref)
    assert err.mean() < 4e-3, err.mean()
    assert err.max() < 4e-2, err.max()


def test_sorted_ray_fused_render_is_exact(params):
    """sort_rays permutes the fine pass by coarse saturation depth and
    inverse-permutes the outputs — results must be bit-identical to the
    unsorted fused render (per-ray independence)."""
    settings = RenderSettings(n_samples=16, n_importance=16)
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    base = np.asarray(render_rays_fused(
        params, rays, settings, spec=SPEC, ray_tile=128, interpret=True,
        early_stop_eps=1e-3,
    ))
    srt = np.asarray(render_rays_fused(
        params, rays, settings, spec=SPEC, ray_tile=128, interpret=True,
        early_stop_eps=1e-3, sort_rays=True,
    ))
    np.testing.assert_array_equal(srt, base)


def test_importance_merge_kernel_matches_xla():
    """The fused importance+merge kernel (ops/pallas_sampling.py) must
    reproduce sample_pdf(deterministic=True) + merge_sorted_z. Boundary
    flips — quantiles landing exactly on a CDF edge resolving to the
    neighbouring interval under a different f32 summation order — are
    allowed on a tiny fraction of samples and bounded by one coarse bin."""
    from nerf_workspaces_explorer_tpu.ops.pallas_sampling import (
        importance_merge_pallas,
    )
    from nerf_workspaces_explorer_tpu.rays.sampling import (
        merge_sorted_z,
        sample_pdf,
    )

    s, r, n_imp = 64, 256, 128
    key = jax.random.PRNGKey(3)
    z = jnp.sort(
        jax.random.uniform(key, (s, r), minval=0.1, maxval=10.0), axis=0
    )
    # Realistic unimodal weights: a Gaussian bump at a per-ray depth.
    centre = jax.random.uniform(jax.random.PRNGKey(4), (1, r), minval=2.0, maxval=8.0)
    w = jnp.exp(-0.5 * ((z - centre) / 0.4) ** 2) + 1e-4

    fused = np.asarray(
        importance_merge_pallas(w, z, n_imp, ray_tile=128, interpret=True)
    )
    z_T = z.T
    z_mid = 0.5 * (z_T[..., 1:] + z_T[..., :-1])
    samples = sample_pdf(z_mid, w.T[..., 1:-1], n_imp, deterministic=True)
    ref = np.asarray(merge_sorted_z(z_T, samples).T)

    assert fused.shape == ref.shape == (s + n_imp, r)
    # Sorted ascending per ray.
    assert np.all(np.diff(fused, axis=0) >= -1e-6)
    err = np.abs(fused - ref)
    bin_w = float(np.max(np.diff(np.asarray(z), axis=0)))
    # This scene's CDF is ~90% degenerate bins (the bump leaves most of the
    # range at zero weight) — a worst case for edge ties; realistic trained
    # weights measured ~0.07%.
    flips = float(np.mean(err > 1e-4))
    assert flips < 5e-3, f"boundary flips on {flips:.2%} of samples"
    assert err.max() <= bin_w + 1e-4, (err.max(), bin_w)


def test_importance_merge_kernel_uniform_weights_exact():
    """With uniform weights the CDF is strictly increasing (no degenerate
    intervals), so the kernel and the XLA path must agree to f32 eps."""
    from nerf_workspaces_explorer_tpu.ops.pallas_sampling import (
        importance_merge_pallas,
    )
    from nerf_workspaces_explorer_tpu.rays.sampling import (
        merge_sorted_z,
        sample_pdf,
    )

    s, r, n_imp = 32, 128, 64
    z = jnp.broadcast_to(
        jnp.linspace(0.5, 8.0, s)[:, None], (s, r)
    ).astype(jnp.float32)
    w = jnp.ones((s, r), jnp.float32)
    fused = np.asarray(
        importance_merge_pallas(w, z, n_imp, ray_tile=128, interpret=True)
    )
    z_T = z.T
    z_mid = 0.5 * (z_T[..., 1:] + z_T[..., :-1])
    samples = sample_pdf(z_mid, w.T[..., 1:-1], n_imp, deterministic=True)
    ref = np.asarray(merge_sorted_z(z_T, samples).T)
    np.testing.assert_allclose(fused, ref, atol=2e-5)


def test_single_pass_preview_matches_jnp_coarse_only(params):
    """render_rays_single_pass (the GUI progressive-preview path) must match
    the jnp pipeline's coarse-only extension on the same net."""
    from nerf_workspaces_explorer_tpu.ops.pallas_render import (
        render_rays_single_pass,
    )

    settings = RenderSettings(n_samples=16, n_importance=16)
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    rgb = np.asarray(render_rays_single_pass(
        params["coarse"], rays, settings, spec=SPEC, n_samples=16,
        ray_tile=128, interpret=True, early_stop_eps=0.0,
    ))
    ref = render_ray_bundle(
        params, rays, settings.for_eval()._replace(n_importance=0), spec=SPEC
    )
    np.testing.assert_allclose(
        rgb, np.asarray(ref["rgb_coarse"]), atol=5e-3
    )


def test_fused_render_single_importance_sample(params):
    """n_importance=1 must route to the XLA sampling fallback instead of
    crashing the fused quantile kernel (its deterministic u divides by
    n_importance - 1)."""
    settings = RenderSettings(n_samples=16, n_importance=1)
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    rgb = np.asarray(render_rays_fused(
        params, rays, settings, spec=SPEC, ray_tile=128, interpret=True
    ))
    assert rgb.shape == (128, 3) and np.all(np.isfinite(rgb))
    ref = render_ray_bundle(params, rays, settings.for_eval(), spec=SPEC, full_outputs=False)
    np.testing.assert_allclose(rgb, np.asarray(ref["rgb_fine"]), atol=5e-3)


def test_int8_negative_skip_shift_no_clipping(params):
    """Checkpoints whose trunk activations are small relative to the skip
    weights need a NEGATIVE skip shift (left-shifted skip accumulator) —
    the old max(0, j) clamp silently saturated skip weights instead."""
    from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_model_quant

    weird = jax.tree.map(lambda x: x, params)
    for net in weird.values():
        # Shrink trunk weights (small activations) but boost the skip-layer
        # encoding weights -> skip_ideal > raw.
        for i, layer in enumerate(net["pts"]):
            net["pts"][i] = {
                "w": layer["w"] * (0.25 if i > 0 else 1.0),
                "b": layer["b"] * 0.25,
            }
        skip_layer = net["pts"][SPEC.skips[0] + 1]
        w = skip_layer["w"]
        net["pts"][SPEC.skips[0] + 1] = {
            "w": w.at[SPEC.width:].set(w[SPEC.width:] * 16.0),
            "b": skip_layer["b"],
        }
    quant = calibrate_model_quant(weird, SPEC, box=4.0)
    kp = prepare_kernel_params(weird["fine"], SPEC, quant=quant["fine"])
    assert any(j < 0 for j in kp.skip_shift), kp.skip_shift

    settings = RenderSettings(n_samples=16, n_importance=16)
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    rgb_q = np.asarray(render_rays_fused(
        weird, rays, settings, spec=SPEC, ray_tile=128, interpret=True,
        quant=quant,
    ))
    ref = render_ray_bundle(weird, rays, settings.for_eval(), spec=SPEC, full_outputs=False)
    err = np.abs(rgb_q - np.asarray(ref["rgb_fine"]))
    assert np.all(np.isfinite(rgb_q))
    assert err.mean() < 4e-3, err.mean()
    assert err.max() < 6e-2, err.max()


def test_importance_only_kernel_matches_sample_pdf():
    """merge=False (the fast serving preset) must reproduce
    sample_pdf(deterministic=True) alone — no coarse depths in the output,
    ascending order directly from ascending quantiles."""
    from nerf_workspaces_explorer_tpu.ops.pallas_sampling import (
        importance_merge_pallas,
    )
    from nerf_workspaces_explorer_tpu.rays.sampling import sample_pdf

    s, r, n_imp = 64, 256, 96
    z = jnp.sort(
        jax.random.uniform(jax.random.PRNGKey(3), (s, r), minval=0.1, maxval=10.0),
        axis=0,
    )
    centre = jax.random.uniform(jax.random.PRNGKey(4), (1, r), minval=2.0, maxval=8.0)
    w = jnp.exp(-0.5 * ((z - centre) / 0.4) ** 2) + 1e-4

    fused = np.asarray(
        importance_merge_pallas(
            w, z, n_imp, ray_tile=128, interpret=True, merge=False
        )
    )
    z_T = z.T
    z_mid = 0.5 * (z_T[..., 1:] + z_T[..., :-1])
    ref = np.asarray(
        sample_pdf(z_mid, w.T[..., 1:-1], n_imp, deterministic=True).T
    )
    assert fused.shape == ref.shape == (n_imp, r)
    assert np.all(np.diff(fused, axis=0) >= -1e-6)  # sorted ascending
    err = np.abs(fused - ref)
    bin_w = float(np.max(np.diff(np.asarray(z), axis=0)))
    flips = float(np.mean(err > 1e-4))  # CDF-edge ties, like the merge test
    assert flips < 5e-3, f"boundary flips on {flips:.2%} of samples"
    assert err.max() <= bin_w + 1e-4


def test_fast_preset_fused_matches_jnp(params):
    """merge_coarse=False end-to-end: the fused kernel and the jnp pipeline
    must agree on the importance-only fine pass."""
    settings = RenderSettings(n_samples=16, n_importance=16, merge_coarse=False)
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    rgb = render_rays_fused(
        params, rays, settings, spec=SPEC, ray_tile=128, interpret=True
    )
    ref = render_ray_bundle(params, rays, settings.for_eval(), spec=SPEC, full_outputs=False)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref["rgb_fine"]), atol=5e-3)


def test_fast_preset_differs_from_reference_placement(params):
    """Sanity: the preset really changes the fine sample set (fewer MLP
    evals), yet stays close to the reference placement on smooth content."""
    fast = RenderSettings(n_samples=16, n_importance=16, merge_coarse=False)
    refp = RenderSettings(n_samples=16, n_importance=16)
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    out_fast = render_ray_bundle(params, rays, fast.for_eval(), spec=SPEC)
    out_ref = render_ray_bundle(params, rays, refp.for_eval(), spec=SPEC)
    assert out_fast["z_vals_fine"].shape[-1] == 16
    assert out_ref["z_vals_fine"].shape[-1] == 32
    diff = np.abs(np.asarray(out_fast["rgb_fine"]) - np.asarray(out_ref["rgb_fine"]))
    assert diff.max() > 0.0  # genuinely different sample placement
    assert diff.mean() < 0.1  # but the same scene content


def test_fused_disp_matches_jnp(params):
    """The fused path's disp output (round-3 parity gap closure) must match
    the jnp pipeline's guarded inverse-depth (reference model_utils.py:88-97)."""
    settings = RenderSettings(n_samples=8, n_importance=8)
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    out = render_rays_fused(
        params, rays, settings, spec=SPEC, ray_tile=128, interpret=True, full=True
    )
    ref = render_ray_bundle(params, rays, settings.for_eval(), spec=SPEC, full_outputs=True)
    np.testing.assert_allclose(
        np.asarray(out.disp), np.asarray(ref["disp_fine"]), rtol=5e-2
    )


def test_fused_render_narrow_spec_matches_jnp():
    """The kernel must stay exact for non-default architectures: a 4x128
    fine net (no skip layer fires at depth 4) with a proposal coarse pass —
    the narrow-net work-reduction candidate (scripts/narrow_net_probe.py)."""
    from nerf_workspaces_explorer_tpu.render.proposal import proposal_spec

    spec = NerfMLPSpec(depth=4, width=128)
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    params = {
        "proposal": init_nerf_params(k1, proposal_spec(6)),
        "fine": init_nerf_params(k2, spec),
    }
    for net in params.values():
        net["alpha"]["b"] = net["alpha"]["b"] + 1.5
    settings = RenderSettings(n_samples=16, n_importance=16, use_proposal=True)
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    fused = np.asarray(
        render_rays_fused(params, rays, settings.for_eval(), spec=spec,
                          ray_tile=128, interpret=True)
    )
    ref = render_ray_bundle(
        params, rays, settings.for_eval(), spec=spec, full_outputs=False
    )
    np.testing.assert_allclose(fused, np.asarray(ref["rgb_fine"]), atol=5e-3)


def test_proposal_subsample_corner_rays_exact():
    """proposal_subsample=2: block-corner rays keep EXACT per-ray placement
    (their lattice ray is themselves), other rays stay close on smooth
    content, and an unknown/indivisible grid falls back to exact placement.
    """
    from nerf_workspaces_explorer_tpu.render.proposal import proposal_spec

    spec = NerfMLPSpec(depth=2, width=128, input_ch=51)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    params = {
        "proposal": init_nerf_params(k1, proposal_spec(6)),
        "fine": init_nerf_params(k2, spec),
    }
    for net in params.values():
        net["alpha"]["b"] = net["alpha"]["b"] + 2.0
    # 16x32 = 512 rays: both the full grid and the 128-ray stride-2 lattice
    # divide by the importance kernel's 128-lane tile, so the exact and
    # subsampled runs use the SAME sampler (CDF tie-breaking differs
    # between the fused sampler and the XLA fallback).
    h, w = 16, 32
    rays = create_rays(
        jnp.eye(4)[None], h, w, 16.0, 16.0, 15.5, 7.5, 0.1, 6.0
    ).reshape(h * w)
    settings = RenderSettings(
        n_samples=8, n_importance=8, num_freqs_3d=8,
        use_proposal=True, merge_coarse=False,
    )
    kw = dict(spec=spec, interpret=True, early_stop_eps=0.0, ray_tile=128)
    exact = np.asarray(
        render_rays_fused(params, rays, settings, grid_hw=(h, w), **kw)
    ).reshape(h, w, 3)
    sub = np.asarray(
        render_rays_fused(
            params, rays, settings._replace(proposal_subsample=2),
            grid_hw=(h, w), **kw,
        )
    ).reshape(h, w, 3)
    # Corner rays of each 2x2 block are their own placement lattice ray.
    np.testing.assert_allclose(sub[::2, ::2], exact[::2, ::2], atol=1e-6)
    assert np.isfinite(sub).all()
    # Off-corner rays share a neighbor's depth placement: close, not equal.
    assert np.abs(sub - exact).max() < 0.05
    # No grid shape -> the stride is ignored (exact placement).
    fallback = np.asarray(
        render_rays_fused(
            params, rays, settings._replace(proposal_subsample=2),
            grid_hw=None, **kw,
        )
    ).reshape(h, w, 3)
    np.testing.assert_allclose(fallback, exact, atol=1e-6)


def test_proposal_subsample_sharded_matches_single_chip():
    """Row-block mesh sharding with even rows per shard must reproduce the
    single-chip subsampled placement exactly (blocks never straddle
    shards) — the production multi-chip serving invariant."""
    from jax.sharding import Mesh
    from nerf_workspaces_explorer_tpu.parallel.sharding import shard_render
    from nerf_workspaces_explorer_tpu.render.proposal import proposal_spec

    if len(jax.devices()) < 4:
        pytest.skip("needs the 4+ device CPU mesh")
    spec = NerfMLPSpec(depth=2, width=128, input_ch=51)
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    params = {
        "proposal": init_nerf_params(k1, proposal_spec(6)),
        "fine": init_nerf_params(k2, spec),
    }
    for net in params.values():
        net["alpha"]["b"] = net["alpha"]["b"] + 2.0
    h, w = 8, 16  # 4 shards x 2 rows: even rows per shard
    rays = create_rays(
        jnp.eye(4)[None], h, w, 8.0, 8.0, 7.5, 3.5, 0.1, 6.0
    ).reshape(h * w)
    settings = RenderSettings(
        n_samples=8, n_importance=8, num_freqs_3d=8,
        use_proposal=True, merge_coarse=False, proposal_subsample=2,
    )
    single = np.asarray(
        render_rays_fused(
            params, rays, settings, spec=spec, interpret=True,
            early_stop_eps=0.0, ray_tile=128, grid_hw=(h, w),
        )
    )
    mesh = Mesh(np.array(jax.devices()[:4]), ("rays",))
    sharded = shard_render(
        params, rays, settings, mesh, spec=spec, use_pallas=True,
        interpret=True, early_stop_eps=0.0, grid_hw=(h, w),
    )["rgb_fine"]
    np.testing.assert_allclose(np.asarray(sharded), single, atol=1e-5)
