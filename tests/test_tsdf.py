"""TSDF fusion + streaming recognition tests (BASELINE config 5)."""

import math

import numpy as np
import jax.numpy as jnp

import objective_slam_tpu as ost
from objective_slam_tpu.config import PPFConfig
from objective_slam_tpu.models import tsdf
from objective_slam_tpu.ops import transforms as tr
from objective_slam_tpu.utils import synthetic, validation


def _sphere_cloud(rng, n, center, radius):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (center + radius * v).astype(np.float32), v.astype(np.float32)


def test_integrate_and_extract_sphere(rng):
    vol = tsdf.make_volume(origin=(-1.5, -1.5, -1.5), dims=(48, 48, 48),
                           voxel_size=1 / 16)
    pts, nrm = _sphere_cloud(rng, 4000, np.zeros(3), 1.0)
    vol = tsdf.integrate(vol, pts, nrm)
    surf = tsdf.extract_surface(vol, capacity=2048)
    assert int(surf.count) > 500
    sp = np.asarray(surf.points)[np.asarray(surf.valid)]
    radii = np.linalg.norm(sp, axis=1)
    # Surface voxels hug the unit sphere within ~a voxel.
    assert abs(np.median(radii) - 1.0) < 0.1
    # Gradient normals point radially (outward = +tsdf direction).
    sn = np.asarray(surf.normals)[np.asarray(surf.valid)]
    cos = np.abs(np.sum(sn * sp / radii[:, None], axis=1))
    assert np.median(cos) > 0.9


def test_extract_sphere_grid_normals_large_capacity(rng):
    """capacity > 8192 switches normal estimation to the O(n + grid)
    moment-grid path (the k-NN n×n distance matrix is 26 GB at KinFu-scale
    extractions) — normals must still be radial and the pad rows must stay
    masked, far, and harmless to real points' windows."""
    vol = tsdf.make_volume(origin=(-1.5, -1.5, -1.5), dims=(96, 96, 96),
                           voxel_size=1 / 32)
    pts, nrm = _sphere_cloud(rng, 60_000, np.zeros(3), 1.0)
    vol = tsdf.integrate(vol, pts, nrm)
    occ = int(tsdf.surface_occupancy(vol))
    assert occ > 8192                      # forces the grid-normal path
    surf = tsdf.extract_surface(vol, capacity=16384)
    assert not bool(surf.overflowed)
    ok = np.asarray(surf.valid)
    sp = np.asarray(surf.points)[ok]
    sn = np.asarray(surf.normals)[ok]
    radii = np.linalg.norm(sp, axis=1)
    assert abs(np.median(radii) - 1.0) < 0.1
    cos = np.abs(np.sum(sn * sp / radii[:, None], axis=1))
    assert np.median(cos) > 0.9
    # Oriented outward by the TSDF gradient, like the k-NN path.
    assert np.median(np.sum(sn * sp, axis=1)) > 0
    # Pads pushed far and zeroed.
    far = np.asarray(surf.points)[~ok]
    if len(far):
        assert np.all(far < -1e6)


def test_weighted_average_multiframe(rng):
    """Two identical frames must not change the fused tsdf (running
    average), and weights must add."""
    vol = tsdf.make_volume(origin=(-1.5, -1.5, -1.5), dims=(32, 32, 32),
                           voxel_size=0.1)
    pts, nrm = _sphere_cloud(rng, 1000, np.zeros(3), 1.0)
    v1 = tsdf.integrate(vol, pts, nrm)
    v2 = tsdf.integrate(v1, pts, nrm)
    m = np.asarray(v1.weight) > 0
    np.testing.assert_allclose(np.asarray(v2.tsdf)[m],
                               np.asarray(v1.tsdf)[m], atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2.weight)[m],
                               2 * np.asarray(v1.weight)[m], atol=1e-4)


def test_streaming_recognition(rng):
    """Fuse partial views of a scene containing a known model, then
    recognize the model's pose from the fused surface."""
    cfg = PPFConfig(max_poses=512, ref_point_df=2)
    mp, mn = synthetic.blob_cloud(rng, 1500, bumps=0.5)
    sp, sn, T_true = synthetic.plant_model(rng, mp, mn)

    vol = tsdf.make_volume(origin=sp.min(axis=0) - 0.3,
                           dims=(40, 40, 40), voxel_size=0.1)
    rec = tsdf.StreamingRecognizer(vol, cfg, surface_capacity=896)

    # Build the model description through the SAME sensing pipeline (fuse
    # the model into its own volume, extract its surface) so both sides
    # share sampling density and normal convention.
    mvol = tsdf.make_volume(origin=mp.min(axis=0) - 0.3,
                            dims=(40, 40, 40), voxel_size=0.1)
    mvol = tsdf.integrate(mvol, mp, mn)
    msurf = tsdf.extract_surface(mvol, capacity=352)
    mpts = np.asarray(msurf.points)[np.asarray(msurf.valid)]
    mnrm = np.asarray(msurf.normals)[np.asarray(msurf.valid)]
    rec.register_model("blob", ost.build_model_description(mpts, mnrm, cfg))

    # Stream the scene in 3 chunks (partial "frames").
    order = rng.permutation(len(sp))
    for part in np.array_split(order, 3):
        rec.integrate_frame(sp[part], sn[part])
    assert rec.frames == 3

    res = rec.recognize()["blob"]
    v = validation.validate_pose(np.asarray(res.pose), T_true,
                                 rec.models["blob"].diameter, cfg)
    # Fused-surface quantization costs accuracy; require the match criteria.
    assert v.match, (v.trans_err, math.degrees(v.rot_err))


def _depth_sphere(rng, n, r=0.8, center=(1.6, 1.6, 1.6)):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (v * r + np.asarray(center)).astype(np.float32), \
        v.astype(np.float32)


_INTR = (160.0, 160.0, 80.0, 60.0)    # fx fy cx cy for a 120x160 image
_SHAPE = (120, 160)


def test_integrate_depth_reconstructs_sphere(rng):
    """Sensor-model fusion: depth images of a sphere from several views →
    fused zero-crossing surface lies on the sphere."""
    sp, _ = _depth_sphere(rng, 60_000)
    vol = tsdf.make_volume(origin=(0.0, 0.0, 0.0), dims=(64, 64, 64),
                           voxel_size=0.05)
    center = np.float32([1.6, 1.6, 1.6])
    for az in (0.0, 2.1, 4.2):
        eye = center + 2.2 * np.float32([math.cos(az), math.sin(az), 0.3])
        T_cw = synthetic.look_at(eye, center)
        depth = synthetic.render_depth(sp, T_cw, _INTR, _SHAPE)
        assert (depth > 0).mean() > 0.05
        vol = tsdf.integrate_depth(vol, depth, _INTR, T_cw)
    surf = tsdf.extract_surface(vol, capacity=4096)
    pts = np.asarray(surf.points)[np.asarray(surf.valid)]
    assert len(pts) > 300
    radii = np.linalg.norm(pts - center, axis=1)
    # Surface voxels within ~a voxel of the true sphere.
    assert abs(np.median(radii) - 0.8) < 0.08, np.median(radii)
    assert np.quantile(np.abs(radii - 0.8), 0.9) < 0.12


def test_integrate_depth_carves_free_space(rng):
    """The projective update must ERASE spurious geometry: a blob fused in
    frame 1 that later frames see through (their depth measures the wall
    BEHIND its location) gets positive free-space updates and disappears
    from the surface. The point-splat integrate cannot do this."""
    center = np.float32([1.6, 1.6, 1.6])
    wall_y = 2.79
    # Wall: a plane behind the spurious blob (seen by all frames).
    gx, gz = np.meshgrid(np.linspace(0.3, 2.9, 160),
                         np.linspace(0.3, 2.9, 160))
    wall = np.stack([gx.ravel(), np.full(gx.size, wall_y), gz.ravel()],
                    axis=1).astype(np.float32)
    # Spurious blob floating between camera and wall.
    blob, _ = _depth_sphere(rng, 4000, r=0.25, center=(1.6, 1.6, 1.6))

    vol = tsdf.make_volume(origin=(0.0, 0.0, 0.0), dims=(64, 64, 64),
                           voxel_size=0.05)
    eye = center + np.float32([0.0, -2.2, 0.0])
    T_cw = synthetic.look_at(eye, center)
    # Frame 1: wall + spurious blob.
    d1 = synthetic.render_depth(np.concatenate([wall, blob]), T_cw, _INTR,
                                _SHAPE)
    vol = tsdf.integrate_depth(vol, d1, _INTR, T_cw)
    # Probe a voxel on the blob's camera-facing SURFACE (its center is
    # deeper than the truncation band and is never written): camera looks
    # along +y, front shell at y = 1.6 - 0.25 -> voxel j = 27.
    t_front = float(vol.tsdf[32, 27, 32])
    assert abs(t_front) < 0.06, t_front                     # blob present

    # Frames 2-9: wall only — rays pass THROUGH the blob location.
    d2 = synthetic.render_depth(wall, T_cw, _INTR, _SHAPE)
    for _ in range(8):
        vol = tsdf.integrate_depth(vol, d2, _INTR, T_cw)
    # Blob-front voxels carved back toward free space (positive tsdf).
    assert float(vol.tsdf[32, 27, 32]) > 0.05
    surf = tsdf.extract_surface(vol, capacity=8192)
    pts = np.asarray(surf.points)[np.asarray(surf.valid)]
    near_blob = np.linalg.norm(pts - center, axis=1) < 0.32
    assert near_blob.sum() == 0, near_blob.sum()
    # The wall itself survives.
    assert (np.abs(pts[:, 1] - wall_y) < 0.1).mean() > 0.8


def test_raycast_depth_roundtrip(rng):
    """raycast_depth of a fused volume returns the measured depth at hit
    pixels (within a voxel)."""
    sp, _ = _depth_sphere(rng, 60_000)
    vol = tsdf.make_volume(origin=(0.0, 0.0, 0.0), dims=(64, 64, 64),
                           voxel_size=0.05)
    center = np.float32([1.6, 1.6, 1.6])
    eye = center + np.float32([0.0, -2.2, 0.2])
    T_cw = synthetic.look_at(eye, center)
    depth = synthetic.render_depth(sp, T_cw, _INTR, _SHAPE)
    vol = tsdf.integrate_depth(vol, depth, _INTR, T_cw)
    T_wc = np.linalg.inv(np.asarray(T_cw, np.float64)).astype(np.float32)
    cast = np.asarray(tsdf.raycast_depth(vol, _INTR, T_wc, _SHAPE,
                                         t_near=0.5, t_far=4.0))
    both = (depth > 0) & (cast > 0)
    assert both.mean() > 0.04
    err = np.abs(cast[both] - depth[both])
    assert np.median(err) < 0.06, np.median(err)


def test_surface_capacity_overflow_and_occupancy(rng):
    """extract_surface reports dropped surface voxels; surface_occupancy
    provides the exact count that sizes a never-overflowing capacity (the
    StreamingRecognizer default)."""
    sp, _ = _depth_sphere(rng, 60_000)
    vol = tsdf.make_volume(origin=(0.0, 0.0, 0.0), dims=(64, 64, 64),
                           voxel_size=0.05)
    center = np.float32([1.6, 1.6, 1.6])
    T_cw = synthetic.look_at(center + np.float32([0.0, -2.2, 0.2]), center)
    depth = synthetic.render_depth(sp, T_cw, _INTR, _SHAPE)
    vol = tsdf.integrate_depth(vol, depth, _INTR, T_cw)

    occ = int(tsdf.surface_occupancy(vol))
    assert occ > 256
    tiny = tsdf.extract_surface(vol, capacity=128)
    assert bool(tiny.overflowed) and int(tiny.count) == occ
    sized = tsdf.extract_surface(vol, capacity=((occ + 127) // 128) * 128)
    assert not bool(sized.overflowed)
    assert int(jnp.sum(sized.valid)) == occ


def test_streaming_recognizer_depth_frames(rng):
    """StreamingRecognizer.integrate_depth_frame: recognize a planted model
    from a depth-fused surface. The model description is built through the
    SAME sensing pipeline (depth-fuse the model into its own volume,
    extract) so both sides share TSDF sampling density and normal
    convention — the deployment workflow for sensor streams."""
    mp, _ = synthetic.blob_cloud(rng, 6000, bumps=0.5)
    scale = 0.5
    mp = (mp * scale).astype(np.float32)
    cfg = PPFConfig(ref_point_df=2, max_poses=512)
    center = np.float32([1.6, 1.6, 1.6])
    sp = mp + center                      # planted at known translation
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, 3] = center

    def fuse_views(cloud, vol):
        for az in (0.4, 2.5, 4.6):
            eye = center + 1.8 * np.float32([math.cos(az), math.sin(az),
                                             0.35])
            T_cw = synthetic.look_at(eye, center)
            depth = synthetic.render_depth(cloud, T_cw, _INTR, _SHAPE)
            vol = tsdf.integrate_depth(vol, depth, _INTR, T_cw)
        return vol

    mvol = fuse_views(sp, tsdf.make_volume(origin=(0.0, 0.0, 0.0),
                                           dims=(64, 64, 64),
                                           voxel_size=0.04))
    msurf = tsdf.extract_surface(mvol, capacity=2048)
    mpts = np.asarray(msurf.points)[np.asarray(msurf.valid)] - center
    mnrm = np.asarray(msurf.normals)[np.asarray(msurf.valid)]
    desc = ost.build_model_description(mpts, mnrm, cfg)

    vol = tsdf.make_volume(origin=(0.0, 0.0, 0.0), dims=(64, 64, 64),
                           voxel_size=0.04)
    rec = tsdf.StreamingRecognizer(vol, cfg, surface_capacity=2048)
    rec.register_model("blob", desc)
    for az in (0.4, 2.5, 4.6):
        eye = center + 1.8 * np.float32([math.cos(az), math.sin(az), 0.35])
        T_cw = synthetic.look_at(eye, center)
        depth = synthetic.render_depth(sp, T_cw, _INTR, _SHAPE)
        rec.integrate_depth_frame(depth, _INTR, T_cw)
    res = rec.recognize()["blob"]
    v = validation.validate_pose(np.asarray(res.pose), T_true,
                                 desc.diameter, cfg)
    assert v.match, (v.trans_err, math.degrees(v.rot_err))


def test_raycast_t_near_zero_first_segment(rng):
    """t_near = 0.0 with a surface crossed in the FIRST coarse segment:
    the bracket records prev_t == 0.0, which a zero not-found sentinel
    (the pre-fix encoding) would discard, zeroing genuine hits."""
    vol = tsdf.make_volume(origin=(-1.0, -1.0, -1.0), dims=(40, 40, 40),
                           voxel_size=0.05)
    pts, nrm = _sphere_cloud(rng, 12000, np.zeros(3), 0.6)
    vol = tsdf.integrate(vol, pts, nrm)
    # Camera just outside the sphere looking at the center: the surface
    # sits ~0.05-0.1 m ahead, inside the first coarse segments of a
    # t_near=0 march with a short t_far.
    eye = np.float32([0.68, 0.0, 0.0])
    T_cw = synthetic.look_at(eye, (0.0, 0.0, 0.0))
    intr = (60.0, 60.0, 31.5, 31.5)
    view = np.asarray(tsdf.raycast_depth(
        vol, intr, np.linalg.inv(T_cw), (64, 64),
        t_near=0.0, t_far=2.0, n_steps=64))
    c = view[32, 32]
    assert c > 0, "central ray lost despite crossing in the first segments"
    assert abs(c - 0.08) < 0.08, c   # eye is 0.08 outside the surface


def _corner_scene(rng, n=70_000):
    """A tracking-friendly scene: sphere + two orthogonal walls (constrains
    all 6 DoF; a lone sphere leaves rotation about its center free)."""
    sp, _ = _depth_sphere(rng, n // 2, r=0.6, center=(1.6, 1.6, 1.6))
    u = rng.uniform(0.4, 2.8, size=(n // 4, 2)).astype(np.float32)
    floor = np.stack([u[:, 0], u[:, 1], np.full(len(u), 0.45)],
                     axis=1).astype(np.float32)
    wall = np.stack([u[:, 0], np.full(len(u), 0.45), u[:, 1] * 0.7 + 0.5],
                    axis=1).astype(np.float32)
    return np.concatenate([sp, floor, wall])


def _perturb_pose(rng, T_cw, rot_deg, trans):
    ax = rng.normal(size=3)
    ax /= np.linalg.norm(ax)
    th = math.radians(rot_deg)
    K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                  [-ax[1], ax[0], 0]])
    R = np.eye(3) + math.sin(th) * K + (1 - math.cos(th)) * K @ K
    dT = np.eye(4, dtype=np.float32)
    dT[:3, :3] = R.astype(np.float32)
    d = rng.normal(size=3)
    dT[:3, 3] = (d / np.linalg.norm(d) * trans).astype(np.float32)
    # Right-composition (world-side): ht_dist(T dT, T) reads back exactly
    # (trans, rot_deg) — left-composition mixes rotation into the
    # translation column with |t_cam|-scaled cross terms.
    return (np.asarray(T_cw) @ dT).astype(np.float32)


def test_track_frame_recovers_perturbed_pose(rng):
    """KinFu frame-to-model tracking: projective point-to-plane ICP against
    the raycast view recovers a frame's camera pose from a perturbed
    initialization (3 deg / 5 cm) to well under a voxel."""
    world = _corner_scene(rng)
    vol = tsdf.make_volume(origin=(0.0, 0.0, 0.0), dims=(64, 64, 64),
                           voxel_size=0.05)
    center = np.float32([1.6, 1.6, 1.4])
    for ang in (0.0, 0.5, 1.0):
        eye = center + np.float32([2.3 * math.cos(ang),
                                   2.3 * math.sin(ang), 0.9])
        T_cw = synthetic.look_at(eye, center)
        depth = synthetic.render_depth(world, T_cw, _INTR, _SHAPE)
        vol = tsdf.integrate_depth(vol, depth, _INTR, T_cw)

    eye = center + np.float32([2.3 * math.cos(0.25),
                               2.3 * math.sin(0.25), 0.95])
    T_gt = synthetic.look_at(eye, center)
    depth = synthetic.render_depth(world, T_gt, _INTR, _SHAPE)
    T_init = _perturb_pose(rng, T_gt, rot_deg=4.0, trans=0.12)
    td0, rd0 = (float(x) for x in tr.ht_dist(T_init, T_gt))
    assert td0 > 0.08          # the premise: a large initial offset
    res = tsdf.track_frame(vol, depth, _INTR, T_init, iters=12)
    td, rd = (float(x) for x in tr.ht_dist(np.asarray(res.T_cw), T_gt))
    assert int(res.inliers) > 2000
    # Convergence is to the FUSED surface, whose projective-TSDF zero
    # crossing is biased up to ~a voxel vs the true world at this coarse
    # 5 cm grid — so the translation floor is the voxel size, not zero.
    assert td < 0.4 * td0 and rd < 0.5 * rd0, (td, td0, rd, rd0)
    assert td < 1.2 * 0.05 and rd < math.radians(1.5), \
        (td, math.degrees(rd))


def test_streaming_tracked_frames_bounded_drift(rng):
    """track_depth_frame consumes raw depth with only the FIRST frame
    posed: every later pose is tracked frame-to-model; cumulative drift
    over the trajectory stays bounded (VERDICT r3: close BASELINE config 5
    in substance)."""
    world = _corner_scene(rng)
    vol = tsdf.make_volume(origin=(0.0, 0.0, 0.0), dims=(64, 64, 64),
                           voxel_size=0.05)
    rec = tsdf.StreamingRecognizer(vol)
    center = np.float32([1.6, 1.6, 1.4])
    n_frames = 6
    drift = []
    for f in range(n_frames):
        ang = 0.12 * f
        eye = center + np.float32([2.3 * math.cos(ang),
                                   2.3 * math.sin(ang), 0.9 + 0.03 * f])
        T_gt = synthetic.look_at(eye, center)
        depth = synthetic.render_depth(world, T_gt, _INTR, _SHAPE)
        res = rec.track_depth_frame(depth, _INTR,
                                    T_cw_hint=T_gt if f == 0 else None)
        if f == 0:
            assert res is None
            continue
        td, rd = (float(x) for x in tr.ht_dist(rec.T_cw, T_gt))
        drift.append((td, math.degrees(rd)))
    tds, rds = zip(*drift)
    # Rotation tracks tightly; translation accumulates the projective-TSDF
    # zero-crossing bias (~0.2 voxel/frame at this COARSE 5 cm test grid —
    # the 2 cm smoke volume shows proportionally less). Bounded ≠ zero:
    # < 2.5 voxels after 5 tracked frames, no blow-up.
    assert max(tds) < 2.5 * 0.05 and max(rds) < 2.0, drift


def test_banded_integrate_equals_dense_within_band(rng):
    """integrate_depth_banded runs the EXACT dense update math on a
    conservative superset of the truncation-band blocks: on every voxel
    within the band of the frame (|sdf| <= tau, valid measurement) tsdf
    and weight must equal the dense result; untouched voxels keep their
    prior state (VERDICT r3 weak-5)."""
    import jax.numpy as jnp

    world = _corner_scene(rng)
    vol = tsdf.make_volume(origin=(0.0, 0.0, 0.0), dims=(64, 64, 64),
                           voxel_size=0.05)
    center = np.float32([1.6, 1.6, 1.4])
    T1 = synthetic.look_at(center + np.float32([2.3, 0.2, 0.9]), center)
    d1 = synthetic.render_depth(world, T1, _INTR, _SHAPE)
    vol = tsdf.integrate_depth(vol, d1, _INTR, T1)   # non-trivial prior

    T2 = synthetic.look_at(center + np.float32([1.9, 1.3, 1.0]), center)
    d2 = synthetic.render_depth(world, T2, _INTR, _SHAPE)

    dense = tsdf.integrate_depth(vol, d2, _INTR, T2)
    occ = int(tsdf.band_block_occupancy(vol, d2, _INTR, T2))
    assert 0 < occ < 512   # the mask is actually selective (64^3 -> 512)
    banded, ovf = tsdf.integrate_depth_banded(vol, d2, _INTR, T2,
                                              block_cap=occ)
    assert not bool(ovf)

    # Per-voxel band membership of frame 2, by the dense projection math.
    D, H, W = vol.dims
    fx, fy, cx, cy = _INTR
    ii = (np.arange(D) + 0.5) * vol.voxel_size + np.asarray(vol.origin)[0]
    jj = (np.arange(H) + 0.5) * vol.voxel_size + np.asarray(vol.origin)[1]
    kk = (np.arange(W) + 0.5) * vol.voxel_size + np.asarray(vol.origin)[2]
    gi, gj, gk = np.meshgrid(ii, jj, kk, indexing="ij")
    pw = np.stack([gi, gj, gk], -1).reshape(-1, 3)
    pc = pw @ np.asarray(T2)[:3, :3].T + np.asarray(T2)[:3, 3]
    z = pc[:, 2]
    u = np.round(fx * pc[:, 0] / np.maximum(z, 1e-9) + cx).astype(int)
    v = np.round(fy * pc[:, 1] / np.maximum(z, 1e-9) + cy).astype(int)
    h, w = _SHAPE
    in_img = (z > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    dm = np.asarray(d2)[np.clip(v, 0, h - 1), np.clip(u, 0, w - 1)]
    sdf = dm - z
    band = (in_img & np.isfinite(dm) & (dm > 0)
            & (np.abs(sdf) <= vol.truncation)).reshape(D, H, W)
    assert band.sum() > 1000

    t_d = np.asarray(dense.tsdf)
    t_b = np.asarray(banded.tsdf)
    w_d = np.asarray(dense.weight)
    w_b = np.asarray(banded.weight)
    np.testing.assert_array_equal(w_b[band], w_d[band])
    np.testing.assert_allclose(t_b[band], t_d[band], rtol=0, atol=1e-6)

    # Voxels the banded pass did not touch keep the prior state exactly.
    untouched = np.asarray(banded.weight) == np.asarray(vol.weight)
    same = np.asarray(banded.tsdf) == np.asarray(vol.tsdf)
    assert np.all(same[untouched & ~band])

    # Overflow flag: a starved cap reports, never silently truncates the
    # blocks it DID update.
    _, ovf2 = tsdf.integrate_depth_banded(vol, d2, _INTR, T2, block_cap=4)
    assert bool(ovf2)


def test_raycast_multi_bracket_resumes_after_graze():
    """A ray that GRAZES a closer feature (min-pooled bracket dips but the
    trilinear field never crosses) must resume and hit the surface behind
    it. Round-5 measurement (tools/raycast_gap_study.py): on the bumpy
    tsdf_smoke object the single-bracket raycast lost 26% of object pixels
    to exactly this; n_brackets>=2 recovers them.

    Hand-built volume: an observed wall at z=2.0, plus one phantom
    negative voxel exactly ONE voxel off the central ray — the 3-cubed
    min-pool dips on the ray (bracket fires) but the trilinear field along
    the ray (frac=0 toward the phantom) is untouched (a pure graze)."""
    vs = 0.05
    dims = (64, 64, 64)
    trunc = 3 * vs
    zc = (np.arange(64) + 0.5) * vs
    d = 2.0 - zc                                   # signed dist to the wall
    tsdf_np = np.broadcast_to(
        np.clip(d, -trunc, trunc)[None, None, :], dims).astype(np.float32)
    wgt_np = np.broadcast_to(
        (d >= -trunc)[None, None, :], dims).astype(np.float32).copy()
    tsdf_np = tsdf_np.copy()
    k1 = 19                                        # z ≈ 0.975
    tsdf_np[32, 33, k1] = -trunc                   # phantom, 1 voxel off
    wgt_np[32, 33, k1] = 1.0
    vol = tsdf.make_volume(origin=(0.0, 0.0, 0.0), dims=dims,
                           voxel_size=vs, truncation=trunc)
    import dataclasses
    vol = dataclasses.replace(vol, tsdf=jnp.asarray(tsdf_np),
                              weight=jnp.asarray(wgt_np))

    # Axis-aligned camera: the central pixel's ray runs exactly along the
    # (32, 32) voxel-center line in +z.
    x0 = (32 + 0.5) * vs
    T_wc = np.eye(4, dtype=np.float32)
    T_wc[:3, 3] = [x0, x0, 0.2]
    cast1 = np.asarray(tsdf.raycast_depth(vol, _INTR, T_wc, _SHAPE,
                                          t_near=0.1, t_far=3.0,
                                          n_brackets=1))
    cast3 = np.asarray(tsdf.raycast_depth(vol, _INTR, T_wc, _SHAPE,
                                          t_near=0.1, t_far=3.0))
    v_pix, u_pix = 60, 80                          # (cy, cx) exactly
    # Single bracket: the graze consumes the only window -> hole.
    assert cast1[v_pix, u_pix] == 0.0
    # Multi-bracket: resumes and lands on the wall (z=2.0, camera z=0.2).
    assert abs(cast3[v_pix, u_pix] - 1.8) < vs, cast3[v_pix, u_pix]
    # A pixel 20 columns over clears the phantom's pooled shadow CONE
    # (tilted rays pass |Δx| = |Δu|·t/8 voxels off-center; the shadow
    # spans ±1.5 voxels around the phantom at z≈0.95, so |Δu| > 16
    # clears it): both agree on the wall (depth = z distance; dir_z = 1).
    assert abs(cast1[v_pix, u_pix - 20] - 1.8) < vs
    assert abs(cast3[v_pix, u_pix - 20] - 1.8) < vs


def test_track_depth_frame_lost_gate_blocks_fusion(rng):
    """A frame whose view barely associates with the model (the camera
    jumped far outside the convergence basin) must trip the lost-tracking
    gate: pose held, volume NOT fused, tracking_lost set — fusing at an
    unconverged pose poisons the volume (the round-5 45°-orbit smoke
    failure). A well-initialized follow-up frame clears the gate."""
    world = _corner_scene(rng)
    vol = tsdf.make_volume(origin=(0.0, 0.0, 0.0), dims=(64, 64, 64),
                           voxel_size=0.05)
    rec = tsdf.StreamingRecognizer(vol)
    center = np.float32([1.6, 1.6, 1.4])
    eye0 = center + np.float32([2.3, 0.0, 0.9])
    T0 = synthetic.look_at(eye0, center)
    rec.track_depth_frame(synthetic.render_depth(world, T0, _INTR, _SHAPE),
                          _INTR, T_cw_hint=T0)

    # Camera swings to face AWAY from the mapped scene: the view barely
    # projects onto the model at the stale init — association collapse.
    # (A large teleport over this plane-dominated scene would NOT trip
    # the gate: floor associates with floor at ~0.37 inlier fraction at
    # any yaw — the documented wrong-attractor limitation.)
    eye1 = center + np.float32([2.6, 0.0, 0.9])
    T1 = synthetic.look_at(eye1, center + np.float32([6.0, 0.0, 1.0]))
    d1 = synthetic.render_depth(world, T1, _INTR, _SHAPE)
    tsdf_before = np.asarray(rec.volume.tsdf)
    res = rec.track_depth_frame(d1, _INTR)
    assert rec.tracking_lost
    np.testing.assert_array_equal(np.asarray(rec.volume.tsdf), tsdf_before)
    np.testing.assert_array_equal(rec.T_cw, np.asarray(T0, np.float32))

    # Small-motion frame from the held pose: gate clears, frame fuses.
    ang2 = 0.1
    eye2 = center + np.float32([2.3 * math.cos(ang2),
                                2.3 * math.sin(ang2), 0.92])
    T2 = synthetic.look_at(eye2, center)
    res2 = rec.track_depth_frame(
        synthetic.render_depth(world, T2, _INTR, _SHAPE), _INTR)
    assert not rec.tracking_lost
    assert not np.array_equal(np.asarray(rec.volume.tsdf), tsdf_before)
    td, rd = (float(x) for x in tr.ht_dist(rec.T_cw, T2))
    assert td < 0.15 and rd < math.radians(3.0), (td, math.degrees(rd))


def test_track_frame_annealed_gate_capture_range(rng):
    """Initializations displaced several FINAL-gate radii must still
    converge: the first half of the GN iterations run a 4x-loose distance
    gate (capture range), the second half the tight gate (precision).
    With a strict single-radius gate this displacement rejects every true
    correspondence and the solve goes nowhere — the 256³ smoke failure
    (12 cm gate vs ~40 cm inter-frame view motion)."""
    world = _corner_scene(rng)
    vol = tsdf.make_volume(origin=(0.0, 0.0, 0.0), dims=(64, 64, 64),
                           voxel_size=0.05)
    center = np.float32([1.6, 1.6, 1.4])
    for ang in (0.0, 0.5, 1.0):
        eye = center + np.float32([2.3 * math.cos(ang),
                                   2.3 * math.sin(ang), 0.9])
        T_cw = synthetic.look_at(eye, center)
        depth = synthetic.render_depth(world, T_cw, _INTR, _SHAPE)
        vol = tsdf.integrate_depth(vol, depth, _INTR, T_cw)

    eye = center + np.float32([2.3 * math.cos(0.25),
                               2.3 * math.sin(0.25), 0.95])
    T_gt = synthetic.look_at(eye, center)
    depth = synthetic.render_depth(world, T_gt, _INTR, _SHAPE)
    # Tight gate = 8 cm: displace by ~3.5 radii (28 cm translation).
    tight = 0.08
    T_init = _perturb_pose(rng, T_gt, rot_deg=5.0, trans=3.5 * tight)
    res = tsdf.track_frame(vol, depth, _INTR, T_init, iters=16,
                           dist_thresh=tight)
    td, rd = (float(x) for x in tr.ht_dist(np.asarray(res.T_cw), T_gt))
    assert int(res.inliers) > 1000
    assert td < 0.1 and rd < math.radians(2.0), (td, math.degrees(rd))
