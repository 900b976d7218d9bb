"""Multi-view real-texture dataset tool (tools/real_plane.py).

The GT images come from numpy projective texture mapping — independent of
the splat renderer — so these tests gate (a) the dataset writes a valid
COLMAP layout the loaders accept, (b) the warping geometry is consistent:
a 3D point on the textured plane, projected with the framework's OWN
camera model, must land on a GT pixel showing that point's texture color.
That cross-checks the two camera conventions (warper vs trainer) against
each other — the property training correctness depends on.
"""

import numpy as np
import pytest

from gsplat_tpu.tools.real_plane import (
    REFERENCE_PHOTO, render_plane_view, write_real_plane_dataset,
)


def _have_photo():
    import os

    return os.path.isfile(REFERENCE_PHOTO)


@pytest.mark.skipif(not _have_photo(), reason="reference photo not present")
def test_dataset_roundtrip_and_projection_consistency(tmp_path):
    from gsplat_tpu.io.colmap import (
        read_cameras_binary, read_images_binary, read_points3d_binary,
    )
    from gsplat_tpu.ops.camera import build_camera_matrices

    scene = write_real_plane_dataset(
        tmp_path, n_views=3, width=160, height=120, n_points=200,
        texture_downsample=8,
    )
    sparse = tmp_path / "realplane" / "sparse" / "0"
    cams = read_cameras_binary(sparse / "cameras.bin")
    imgs = read_images_binary(sparse / "images.bin")
    pts = read_points3d_binary(sparse / "points3D.bin")
    assert len(cams) == 1 and len(imgs) == 3 and len(pts) == 200

    from PIL import Image as PILImage

    cam = cams[1]
    im = imgs[1]
    gt = np.asarray(
        PILImage.open(tmp_path / "realplane" / im.name)
    ).astype(np.float32) / 255.0

    # Project exact-plane points (z=0) with the framework's camera model
    # and compare the GT pixel color against the texture color there.
    cm = build_camera_matrices(
        im.qvec, im.tvec, cam.width, cam.height, cam.focal_x, cam.focal_y
    )
    view = np.asarray(cm.view)
    proj = np.asarray(cm.proj)
    ax, ay = scene.half_extent
    th, tw = scene.texture.shape[:2]
    checked = 0
    for p in scene.points_xyz[:120]:
        x, y = p[0], p[1]
        pw = np.array([x, y, 0.0, 1.0])
        pc = view @ pw
        if pc[2] < 0.3:
            continue
        clip = proj @ pc  # proj maps CAMERA coords (see train/step.py)
        ndc = clip[:3] / clip[3]
        u = (ndc[0] * 0.5 + 0.5) * cam.width
        v = (ndc[1] * 0.5 + 0.5) * cam.height
        if not (2 <= u < cam.width - 2 and 2 <= v < cam.height - 2):
            continue
        tex_u = int(round((x / ax * 0.5 + 0.5) * (tw - 1)))
        tex_v = int(round((y / ay * 0.5 + 0.5) * (th - 1)))
        expected = scene.texture[tex_v, tex_u]
        got = gt[int(v), int(u)]
        # Loose: bilinear + supersampling + pixel rounding; catching a
        # convention mismatch (flipped axis, wrong transpose) which would
        # decorrelate the colors entirely.
        if np.all(np.abs(got - expected) < 0.25):
            checked += 1
    assert checked >= 40, f"only {checked} consistent projections"


@pytest.mark.skipif(not _have_photo(), reason="reference photo not present")
def test_views_share_plane_content(tmp_path):
    """Two different views of the same plane region must see the same
    texture (multi-view consistency of the GT itself)."""
    from PIL import Image as PILImage

    scene = write_real_plane_dataset(
        tmp_path, n_views=2, width=160, height=120, n_points=10,
        texture_downsample=8,
    )
    ims = list(scene.images.values())
    tex = scene.texture

    # Re-render view 0 at the same pose via the public helper and compare
    # against the PNG on disk (IO roundtrip + determinism).
    from gsplat_tpu.io.colmap import read_images_binary

    sparse = tmp_path / "realplane" / "sparse" / "0"
    imgs = read_images_binary(sparse / "images.bin")
    im0 = imgs[1]
    regen = render_plane_view(
        tex, scene.half_extent, im0.qvec, im0.tvec, 160, 120,
        160 * 1.1,
    )
    disk = np.asarray(
        PILImage.open(tmp_path / "realplane" / im0.name)
    ).astype(np.float32) / 255.0
    assert np.abs(regen - disk).max() < 2.5 / 255.0
    # The two views must not be identical (real parallax).
    del ims
    disk1 = np.asarray(
        PILImage.open(tmp_path / "realplane" / imgs[2].name)
    ).astype(np.float32) / 255.0
    assert np.abs(disk1 - disk).mean() > 0.01


@pytest.mark.skipif(not _have_photo(), reason="reference photo not present")
def test_layers_dataset_occlusion_and_projection(tmp_path):
    """The layered dataset's GT must honor occlusion (nearest plane wins)
    and stay consistent with the framework's camera model: a 3D point on
    the FRONT layer, projected with build_camera_matrices, lands on a GT
    pixel showing the front layer's texture even where the back wall is
    behind it."""
    from gsplat_tpu.io.colmap import read_cameras_binary, read_images_binary
    from gsplat_tpu.ops.camera import build_camera_matrices
    from gsplat_tpu.tools.real_plane import (
        _bilinear, _default_layers, write_real_layers_dataset,
    )
    from PIL import Image as PILImage

    scene = write_real_layers_dataset(
        tmp_path, n_views=3, width=160, height=120, n_points=300,
        texture_downsample=8,
    )
    sparse = tmp_path / "reallayers" / "sparse" / "0"
    cams = read_cameras_binary(sparse / "cameras.bin")
    imgs = read_images_binary(sparse / "images.bin")
    assert len(imgs) == 3
    cam = cams[1]
    planes = _default_layers(scene.texture)
    front = planes[2]

    checked = 0
    for im in imgs.values():
        gt = np.asarray(
            PILImage.open(tmp_path / "reallayers" / im.name)
        ).astype(np.float32) / 255.0
        cm = build_camera_matrices(
            im.qvec, im.tvec, cam.width, cam.height,
            cam.focal_x, cam.focal_y,
        )
        view, proj = np.asarray(cm.view), np.asarray(cm.proj)
        rng = np.random.default_rng(1)
        su = rng.uniform(-front.half[0] * 0.9, front.half[0] * 0.9, 80)
        sv = rng.uniform(-front.half[1] * 0.9, front.half[1] * 0.9, 80)
        pts = (front.origin[None, :] + su[:, None] * front.ex[None, :]
               + sv[:, None] * front.ey[None, :])
        pth, ptw = front.texture.shape[:2]
        tu = (su / front.half[0] * 0.5 + 0.5) * (ptw - 1)
        tv = (sv / front.half[1] * 0.5 + 0.5) * (pth - 1)
        expected = _bilinear(front.texture, tu, tv)
        for p, exp in zip(pts, expected):
            pc = view @ np.array([*p, 1.0])
            if pc[2] < 0.3:
                continue
            clip = proj @ pc
            ndc = clip[:3] / clip[3]
            u = (ndc[0] * 0.5 + 0.5) * cam.width
            v = (ndc[1] * 0.5 + 0.5) * cam.height
            if not (2 <= u < cam.width - 2 and 2 <= v < cam.height - 2):
                continue
            if np.all(np.abs(gt[int(v), int(u)] - exp) < 0.25):
                checked += 1
    assert checked >= 60, f"only {checked} consistent front-layer hits"

    # Occlusion sanity: some GT pixels differ between layered and
    # back-wall-only renders (the panels actually cover the wall).
    from gsplat_tpu.tools.real_plane import render_layered_view

    im0 = list(imgs.values())[0]
    full = render_layered_view(
        planes, im0.qvec, im0.tvec, cam.width, cam.height, cam.focal_x
    )
    wall_only = render_layered_view(
        planes[:1], im0.qvec, im0.tvec, cam.width, cam.height, cam.focal_x
    )
    frac_covered = np.mean(np.any(np.abs(full - wall_only) > 0.05, axis=-1))
    assert 0.02 < frac_covered < 0.9, frac_covered
