"""Reference golden-vector tests ported from the CUDA test suite.

These pin the exact values the reference tests pin (VERDICT r1 item 6):
- the 3-Gaussian sorted splat list + tile boundaries
  (/root/reference/tests/cuda_forward_test.cpp:422-538);
- split-children statistics (adaptive_density_test.cpp:235-292 checks
  scale/opacity only because the CUDA RNG is time-seeded; our counter-based
  PRNG lets us additionally verify the children are N(parent, Sigma)
  distributed);
- the PLY byte layout (/root/reference/src/utils.cpp:95-175 — note the
  reference stores Eigen coeffs whose memory order its device code and PLY
  writer both treat as (w,x,y,z), so rot_0 is the trained w component);
- one central finite-difference check through the FULL rasterize custom
  VJP (binning + Pallas kernels + regroup) on a tiny scene.
"""

import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu.ops.binning import build_tile_tables


def test_binning_reference_golden_list():
    """cuda_forward_test.cpp GetSortedGaussianList: 3 Gaussians on a 64x64
    image -> sorted gaussian list [0, 1, 1, 2], tile ranges
    t5=[0,2) t6=[2,3) t10=[3,4)."""
    uv = jnp.asarray([[24.0, 24.0], [32.0, 24.0], [40.0, 40.0]], jnp.float32)
    z = jnp.asarray([10.0, 20.0, 5.0], jnp.float32)
    radius = jnp.asarray(
        [
            [4.0, 4.0, 0.0, 1.0],
            [4.0, 4.0, 0.0, 1.0],
            [6.0, 6.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    mask = jnp.ones((3,), bool)
    attrs = jnp.zeros((3, 9), jnp.float32).at[:, 0:2].set(uv)
    tables = build_tile_tables(
        uv, z, radius, mask, attrs=attrs,
        num_tiles_x=4, num_tiles_y=4, tile_size=16,
        pair_cap=512, chunk_size=128,
    )
    assert int(tables.num_pairs) == 4
    np.testing.assert_array_equal(
        np.asarray(tables.splat_gid[:4]), [0, 1, 1, 2]
    )
    start = np.asarray(tables.tile_start)
    count = np.asarray(tables.tile_count)
    assert (start[5], count[5]) == (0, 2)
    assert (start[6], count[6]) == (2, 1)
    assert (start[10], count[10]) == (3, 1)
    empty = [t for t in range(16) if t not in (5, 6, 10)]
    assert all(count[t] == 0 for t in empty)


def test_split_children_statistics(rng):
    """adaptive_density_test.cpp SplitGaussiansTest, extended: children get
    scale log(exp(s)/1.6) and the parent's opacity (the reference's
    assertions), and — testable here because densification RNG is
    counter-based, not time-seeded — their positions are distributed
    N(parent_xyz, R S^2 R^T)."""
    from gsplat_tpu.train.density import DensityStatics, adaptive_density_step
    from gsplat_tpu.train.init import GaussianData
    from gsplat_tpu.train.state import init_state

    scale = np.log(np.array([0.4, 0.2, 0.1], np.float32))
    # Non-trivial rotation: 60 degrees about a skew axis.
    axis = np.array([1.0, 2.0, 2.0]) / 3.0
    half = np.deg2rad(30.0)
    quat = np.concatenate(
        [[np.cos(half)], np.sin(half) * axis]
    ).astype(np.float32)
    parent_xyz = np.array([0.5, -1.0, 4.0], np.float32)
    g = GaussianData(
        xyz=parent_xyz[None],
        rgb=np.zeros((1, 3), np.float32),
        opacity=np.array([0.8], np.float32),
        scale=scale[None],
        quaternion=quat[None],
    )
    state = init_state(g, n_cap=16)
    # Mark the single Gaussian as a split candidate: big accumulated grad,
    # scale above the clone threshold.
    state = state._replace(
        uv_grad_accum=jnp.full((16,), 10.0),
        accum_dur=jnp.ones((16,), jnp.int32),
    )
    ds = DensityStatics(
        scene_extent=8.0, uv_grad_threshold=0.1,
        delete_opacity_threshold=0.01, split_scale_factor=1.6,
        max_gaussians=100,
    )
    step = jax.jit(lambda s, k: adaptive_density_step(s, k, ds))

    children = []
    for trial in range(400):
        new_state, info = step(state, jax.random.key(trial))
        assert int(info.num_split) == 1
        xyz = np.asarray(new_state.params["xyz"])[:2]
        children.append(xyz)
        if trial == 0:
            # Reference assertions: children scale = log(exp(s)/1.6),
            # opacity copied.
            sc = np.asarray(new_state.params["scale"])[:2]
            np.testing.assert_allclose(
                sc, np.log(np.exp(scale) / 1.6)[None].repeat(2, 0),
                rtol=1e-5,
            )
            op = np.asarray(new_state.params["opacity"])[:2]
            np.testing.assert_allclose(op, [0.8, 0.8], rtol=1e-6)
    pts = np.concatenate(children, axis=0)  # (800, 3) samples

    mean = pts.mean(axis=0)
    np.testing.assert_allclose(mean, parent_xyz, atol=0.05)
    # Sample covariance ~ R S^2 R^T.
    w, x, y, zq = quat
    R = np.array(
        [
            [1 - 2 * (y * y + zq * zq), 2 * (x * y - w * zq),
             2 * (x * zq + w * y)],
            [2 * (x * y + w * zq), 1 - 2 * (x * x + zq * zq),
             2 * (y * zq - w * x)],
            [2 * (x * zq - w * y), 2 * (y * zq + w * x),
             1 - 2 * (x * x + y * y)],
        ]
    )
    sigma = R @ np.diag(np.exp(scale) ** 2) @ R.T
    cov = np.cov(pts.T)
    np.testing.assert_allclose(cov, sigma, atol=0.03 * sigma.max() + 0.003)


def test_ply_reference_byte_layout(tmp_path, rng):
    """utils.cpp:95-175 byte-for-byte: header property order, then per
    vertex [x y z 0 0 0 f_dc0..2 f_rest... opacity scale0..2 rot0..3
    (normalized, w first)] as little-endian f32."""
    from gsplat_tpu.io.ply import save_ply

    n, num_sh = 3, 9
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    rgb = rng.normal(size=(n, 3)).astype(np.float32)
    opa = rng.normal(size=(n,)).astype(np.float32)
    scale = rng.normal(size=(n, 3)).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    sh = rng.normal(size=(n, num_sh)).astype(np.float32)
    path = tmp_path / "golden.ply"
    save_ply(path, xyz, rgb, opa, scale, quat, sh)

    blob = path.read_bytes()
    header, _, body = blob.partition(b"end_header\n")
    lines = header.decode().splitlines()
    expected_props = (
        ["x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2"]
        + [f"f_rest_{i}" for i in range(num_sh)]
        + ["opacity", "scale_0", "scale_1", "scale_2",
           "rot_0", "rot_1", "rot_2", "rot_3"]
    )
    assert lines[0] == "ply"
    assert lines[1] == "format binary_little_endian 1.0"
    assert lines[2] == f"element vertex {n}"
    assert lines[3:] == [f"property float {p}" for p in expected_props]

    stride = len(expected_props)
    vals = np.array(
        struct.unpack(f"<{n * stride}f", body), np.float32
    ).reshape(n, stride)
    np.testing.assert_allclose(vals[:, 0:3], xyz, rtol=1e-6)
    np.testing.assert_array_equal(vals[:, 3:6], 0.0)
    np.testing.assert_allclose(vals[:, 6:9], rgb, rtol=1e-6)
    np.testing.assert_allclose(vals[:, 9 : 9 + num_sh], sh, rtol=1e-6)
    np.testing.assert_allclose(vals[:, 9 + num_sh], opa, rtol=1e-6)
    np.testing.assert_allclose(
        vals[:, 10 + num_sh : 13 + num_sh], scale, rtol=1e-6
    )
    qn = quat / np.linalg.norm(quat, axis=1, keepdims=True)
    np.testing.assert_allclose(
        vals[:, 13 + num_sh : 17 + num_sh], qn, rtol=1e-5, atol=1e-6
    )


def test_full_chain_finite_difference(rng):
    """Central finite differences through the COMPLETE differentiable path
    (projection -> covariance -> binning expand kernels -> Pallas
    rasterizer -> segment-sum regroup -> fused loss) on a tiny scene."""
    from test_train import _synthetic_gaussians, _statics, W, H

    from gsplat_tpu.ops.loss import fused_loss
    from gsplat_tpu.ops.render import pack_attrs, rasterize
    from gsplat_tpu.train.state import init_state
    from gsplat_tpu.train.step import _per_gaussian

    g = _synthetic_gaussians(rng, 12)
    state = init_state(g, n_cap=16)
    cm, st = _statics()
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    view, proj, campos = (
        jnp.asarray(cm.view), jnp.asarray(cm.proj), jnp.asarray(cm.campos),
    )
    alive = state.alive

    def loss_of(params):
        uv, conic, rgb, mask, radius, z = _per_gaussian(
            params, alive, view, proj, campos, st
        )
        attrs = pack_attrs(uv, conic, rgb, params["opacity"])
        sg = jax.lax.stop_gradient
        tables = build_tile_tables(
            sg(uv), sg(z), radius, mask, attrs=sg(attrs),
            num_tiles_x=st.num_tiles_x, num_tiles_y=st.num_tiles_y,
            tile_size=st.tile, pair_cap=st.pair_cap, chunk_size=st.chunk,
            bf16_colors=False,  # finite differences need exact f32
        )
        out = rasterize(
            uv, conic, rgb, params["opacity"], tables, jnp.float32(0.2),
            width=st.width, height=st.height, tile=st.tile, chunk=st.chunk,
            bf16_grads=False,
        )
        return fused_loss(out.image, gt, st.ssim_frac)

    loss_jit = jax.jit(loss_of)
    grads = jax.jit(jax.grad(loss_of))(state.params)

    # xyz is excluded: the framework intentionally reproduces the
    # reference's double-scaled uv->xyz gradient convention
    # (render_backward.cu:186-187 applied on top of projection AD, see
    # ops/render.py), so xyz grads differ from the true derivative by a
    # per-component (0.5*W, 0.5*H) mix by design.
    checked = 0
    for name, coords in (
        ("quat", [(0, 1), (3, 2), (5, 0)]),
        ("opacity", [(1,), (5,), (3,)]),
        ("scale", [(2, 1), (0, 0), (7, 2)]),
        ("rgb", [(4, 0), (2, 2), (6, 1)]),
    ):
        for c in coords:
            eps = 2e-3
            p_plus = dict(state.params)
            p_plus[name] = state.params[name].at[c].add(eps)
            p_minus = dict(state.params)
            p_minus[name] = state.params[name].at[c].add(-eps)
            fd = (float(loss_jit(p_plus)) - float(loss_jit(p_minus))) / (
                2 * eps
            )
            an = float(grads[name][c])
            if abs(an) < 1e-4 and abs(fd) < 1e-4:
                continue  # both negligible: uninformative coordinate
            assert fd == pytest.approx(an, rel=0.08, abs=2e-3), (
                name, c, fd, an,
            )
            checked += 1
    assert checked >= 4, "too few informative FD coordinates"
