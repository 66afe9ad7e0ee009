"""Regression test: frame-to-model tracking over a deliberately degenerate
(bare flat wall) segment stays bounded and is DETECTED (VERDICT r2 item 1).

Round 2's production-scale failure mode: point-to-plane ICP is blind to
in-plane translation on a featureless wall, and re-estimating the motion
model through the blind stretch closes a divergent feedback loop (measured
~0.4 m per 50-frame fragment).  The fix under test (odometry/kinfu.py):

  - spectral-floor motion prior: null directions follow the constant-body-
    velocity prediction; observable directions stay data-driven,
  - trusted velocity: re-estimated only on healthy frames (observability +
    fitness gates), frozen across the degenerate stretch,
  - obs_ratio telemetry that flags the degenerate frames for the pipeline's
    repair path (suspect odometry edges -> line-process-eligible).
"""

import numpy as np
import jax.numpy as jnp

from elasticreconstruction_tpu.core import camera, se3
from elasticreconstruction_tpu.odometry import FragmentConfig, OdometryConfig, build_fragment
from elasticreconstruction_tpu.synthetic import render
from elasticreconstruction_tpu.synthetic import sdf as S

INTR = camera.Intrinsics(fx=100.0, fy=100.0, cx=59.5, cy=44.5, width=120, height=90)

ODOM = OdometryConfig(levels=2, iterations=(6, 8), raycast_steps=160, depth_max=5.0)
FRAG = FragmentConfig(
    frames_per_fragment=36,
    volume_shape=(96, 96, 96),
    voxel_size=0.05,
    volume_min_z=0.2,
    cloud_capacity=16384,
    depth_max=5.0,
    odometry=ODOM,
)


def _wall_scene() -> S.SDF:
    """A wall at z=2 with spheres near both ends of a lateral sweep, bare in
    the middle: frames see sphere A, then ONLY the wall, then sphere B.
    Spheres (not boxes): their normals span all directions, so the end
    segments genuinely constrain all 3 translation axes."""
    wall = S.box((0.0, 0.0, 2.3), (8.0, 8.0, 0.3))
    sphere_a = S.sphere((-1.15, 0.0, 1.5), 0.35)
    sphere_b = S.sphere((1.2, 0.0, 1.5), 0.35)
    return S.union(wall, sphere_a, sphere_b)


def _sweep_poses(n: int) -> np.ndarray:
    """Constant-velocity lateral sweep facing the wall (+x at 40 mm/frame)."""
    poses = []
    for k in range(n):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -0.7 + 0.04 * k
        poses.append(T)
    return np.stack(poses)


def test_flat_wall_segment_bounded_and_detected():
    scene = _wall_scene()
    n = FRAG.frames_per_fragment + 1
    poses = _sweep_poses(n)
    depths = render.render_sequence(scene, jnp.asarray(poses), INTR)

    res = build_fragment(depths, INTR, FRAG)
    local = np.array(res.local_poses)
    obs = np.array(res.obs_ratio)

    g_rel = np.einsum("ij,njk->nik", np.linalg.inv(poses[0]), poses)
    errs = np.linalg.norm(
        np.stack([(np.linalg.inv(g_rel[k]) @ local[k])[:3, 3] for k in range(n)]), axis=1
    )

    # (a) detection: the bare-wall mid-segment must trip the observability
    # gate that marks the fragment suspect for the downstream repair path.
    mid = obs[10:26]
    assert mid.min() < ODOM.healthy_obs_ratio * 4, (
        f"degenerate segment not detected: min obs_ratio {mid.min():.4f}"
    )
    # The pillar segments at both ends must read healthy, or the gate would
    # flag everything and the trusted velocity would never update.
    assert obs[1:6].max() > ODOM.healthy_obs_ratio
    assert obs[-5:].max() > ODOM.healthy_obs_ratio

    # (b) bounded drift: the trusted velocity carries the sweep through the
    # blind stretch.  Round-2 behavior (no prior) diverged to ~0.4 m over a
    # 50-frame wall stretch; the bound here is ~25x tighter than that and
    # loose enough to stay hermetic across backends.
    assert errs.max() < 0.06, f"drift through flat wall: max {errs.max():.4f} m"
    assert errs[-1] < 0.06, f"end error {errs[-1]:.4f} m"


def test_blind_segment_follows_trusted_velocity():
    """Mechanism check: through the blind mid-segment the estimate's per-frame
    x-step must stay near the true 40 mm sweep — i.e. the trusted velocity
    learned on the healthy opening segment actually drives the prediction
    (guards against the prior/velocity gates becoming accidental no-ops)."""
    scene = _wall_scene()
    n = FRAG.frames_per_fragment + 1
    poses = _sweep_poses(n)
    depths = render.render_sequence(scene, jnp.asarray(poses), INTR)
    res = build_fragment(depths, INTR, FRAG)
    local = np.array(res.local_poses)

    # Per-frame x-translation steps over the blind stretch (frames 16-22: the
    # sphere-free window per the obs telemetry).
    steps = []
    for k in range(16, 23):
        v = np.linalg.inv(local[k - 1]) @ local[k]
        steps.append(v[0, 3])
    steps = np.array(steps)
    assert np.all(np.abs(steps - 0.04) < 0.012), (
        f"blind-segment x-steps {np.round(steps * 1000, 1)} mm vs true 40 mm"
    )
