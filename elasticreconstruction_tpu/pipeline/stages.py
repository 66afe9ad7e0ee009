"""Stage drivers: the five reference executables as resumable functions.

Artifact layout mirrors the reference contracts (SURVEY.md §0/§5) so every
stage is re-runnable from files:

    out/fragments/cloud_bin_<f>.pcd      fragment clouds (local frame)
    out/fragments/local_<f>.log          per-frame camera-to-fragment poses
    out/fragments/fragments.log          chained fragment base poses
    out/registration/odometry.log/.info  consecutive-fragment edges
    out/registration/loop.log/.info      accepted loop-closure candidates
    out/posegraph/pose.log               optimized fragment poses
    out/posegraph/kept_edges.txt         loop edges surviving the line process
    out/corres/corres_<i>_<j>.txt        dense correspondences (optional spill)
    out/slac/ctr[_<f>].txt               optimized control lattice(s)
    out/slac/pose_slac.log               refined fragment poses
    out/integrate/mesh.ply               final mesh
    out/integrate/trajectory.log         final per-frame trajectory
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from ..core import io_logfmt, se3
from ..core.types import PointCloud
from ..elastic import build_correspondences, optimize_fragments
from ..elastic.correspondence import CorresSet
from ..elastic.slac import SlacMode
from ..eval import ate as ate_mod
from ..integrate import extract_mesh, mesh as mesh_mod
from ..integrate.scene import SceneConfig, integrate_frames, integrate_frames_slac
from ..kernels import tsdf as tsdf_mod
from ..odometry import build_fragment
from ..posegraph import EdgeList, optimize_pose_graph
from ..registration import register_pairs_batch
from .config import PipelineConfig
from .dataset import Dataset


def _log(stage: str, msg: str, **kv) -> None:
    rec = {"stage": stage, "msg": msg, "t": round(time.time(), 3), **kv}
    print(json.dumps(rec), flush=True)


# ---------------------------------------------------------------- fragments


def run_fragments(ds: Dataset, cfg: PipelineConfig) -> None:
    out = cfg.p_fragments()
    out.mkdir(parents=True, exist_ok=True)
    K = cfg.frames_per_fragment
    nf = max(1, (len(ds) - 1) // K)
    intr = ds.intrinsics
    base = np.eye(4, dtype=np.float32)
    bases = []
    t0 = time.time()
    # Trusted body-twist velocity carries ACROSS the fragment reset: camera
    # motion is continuous, and a fragment that opens onto degenerate
    # geometry needs the healthy prediction from its predecessor.
    velocity = jnp.zeros(6, jnp.float32)
    ocfg = cfg.fragment.odometry
    for f in range(nf):
        frames = ds.depth_chunk(f * K, K + 1)
        if frames.shape[0] < K + 1:  # pad final fragment (zero depth = no-op)
            pad = np.zeros((K + 1 - frames.shape[0],) + frames.shape[1:], np.float32)
            frames = np.concatenate([frames, pad])
        res = build_fragment(jnp.asarray(frames), intr, cfg.fragment, init_velocity=velocity)
        velocity = res.final_velocity
        cloud = res.cloud
        m = np.array(cloud.mask)
        io_logfmt.write_pcd(
            out / f"cloud_bin_{f}.pcd",
            np.array(cloud.points)[m],
            np.array(cloud.normals)[m],
        )
        local = np.array(res.local_poses)
        io_logfmt.write_log(out / f"local_{f}.log", io_logfmt.Trajectory.from_matrices(local))
        bases.append(base.copy())
        base = base @ local[K]  # overlap frame chains the next fragment
        # Tracking-health artifact: per-fragment summary of the per-frame
        # fitness / RMSE / translation-observability telemetry.  A fragment is
        # SUSPECT when any frame tracked against effectively unobservable
        # geometry or with poor support — downstream stages re-register its
        # odometry edges and make them line-process-eligible (VERDICT r2 #1).
        fit = np.array(res.fitness)[1:]
        rmse = np.array(res.rmse)[1:]
        obs = np.array(res.obs_ratio)[1:]
        health = {
            "fragment": f,
            "min_fitness": float(fit.min()) if K > 0 else 1.0,
            "max_rmse": float(rmse.max()) if K > 0 else 0.0,
            "min_obs_ratio": float(obs.min()) if K > 0 else 1.0,
            "frames_unhealthy": int(
                np.sum((obs < ocfg.healthy_obs_ratio) | (fit < ocfg.healthy_fitness))
            ),
            "suspect": bool(
                np.any(obs < ocfg.healthy_obs_ratio) or np.any(fit < ocfg.healthy_fitness)
            ),
        }
        with open(out / f"health_{f}.json", "w") as hf:
            json.dump(health, hf, indent=2)
        _log("fragments", "fragment built", points=int(m.sum()), **health)
    io_logfmt.write_log(out / "fragments.log", io_logfmt.Trajectory.from_matrices(np.stack(bases)))
    _log("fragments", "done", num_fragments=nf, seconds=round(time.time() - t0, 2))


def load_fragment_health(cfg: PipelineConfig, nf: int) -> list[dict]:
    """Per-fragment tracking-health records (permissive default if absent)."""
    out = cfg.p_fragments()
    health = []
    for f in range(nf):
        p = out / f"health_{f}.json"
        if p.exists():
            with open(p) as hf:
                health.append(json.load(hf))
        else:
            health.append({"fragment": f, "suspect": False})
    return health


def load_fragment_clouds(cfg: PipelineConfig) -> list[PointCloud]:
    out = cfg.p_fragments()
    clouds = []
    cap = cfg.fragment.cloud_capacity
    f = 0
    while (out / f"cloud_bin_{f}.pcd").exists():
        pts, nrm = io_logfmt.read_pcd(out / f"cloud_bin_{f}.pcd")
        n = min(len(pts), cap)
        cloud = PointCloud.from_points(pts[:n], None if nrm is None else nrm[:n]).pad_to(cap)
        clouds.append(cloud)
        f += 1
    return clouds


# ------------------------------------------------------------- registration


def run_registration(
    cfg: PipelineConfig, *, all_pairs: bool = True, gate_poses: np.ndarray | None = None
) -> dict:
    """Odometry-edge refinement + (optionally) all-pairs loop candidates.

    ``all_pairs=False`` is BASELINE config 2 (odometry chain only): loop.log
    and loop.info are written empty so downstream stages run unchanged.

    Throughput discipline (VERDICT r2 #5): every batch is QUEUED on device
    and results are pulled to the host ONCE at the end of the stage — the
    round-2 per-batch ``np.array`` pulls paid a host<->device round trip per
    batch (23 ms RTT on the tunneled chip) and capped the achieved stage rate
    at ~3 pairs/s vs the 73 pairs/s the same computation benches at.
    """
    out = cfg.p_registration()
    out.mkdir(parents=True, exist_ok=True)
    clouds = load_fragment_clouds(cfg)
    nf = len(clouds)
    bases = io_logfmt.read_log(cfg.p_fragments() / "fragments.log").matrices().astype(np.float32)
    health = load_fragment_health(cfg, nf)
    t0 = time.time()

    from ..registration import (
        edge_information_batch,
        prep_fragments_batch,
        refine_edges_batch,
        register_prepped_batch,
    )

    rcfg = cfg.registration
    # Pad the fragment count to a bucket of 8: the prep program compiles per
    # fragment-count shape, and a tunnel compile costs minutes (round 3
    # profile: 367 s compile vs 1.2 s execution) — bucketing means scenes of
    # 49..56 fragments share one cached executable.  Padded rows are never
    # gathered (all pair indices are < nf).
    pad_f = (-nf) % 8
    all_clouds = jax.tree.map(
        lambda *xs: jnp.concatenate(
            [jnp.stack(xs)] + ([jnp.stack(xs[:1])] * pad_f if pad_f else []), axis=0
        ),
        *clouds,
    )
    prepped = prep_fragments_batch(all_clouds, rcfg)

    # Odometry edges: the chained base poses give the init, but raw odometry
    # carries the within-fragment drift — refine every consecutive pair with
    # ONE batched point-to-plane ICP over the prepped fine clouds (the
    # reference re-refines each edge in BuildCorrespondence — SURVEY.md §3.4).
    idx_i = jnp.arange(nf - 1, dtype=jnp.int32)
    idx_j = idx_i + 1
    init_T = jnp.asarray(
        np.stack([np.linalg.inv(bases[f]) @ bases[f + 1] for f in range(nf - 1)]).astype(
            np.float32
        )
    )
    ir, infos_ref = refine_edges_batch(prepped, idx_i, idx_j, init_T, rcfg)
    # Trust region: odometry is locally reliable; reject refinements that
    # slide far from the init (planar overlaps are point-to-plane degenerate
    # and can drift unboundedly) or that matched poorly.
    delta = se3.log(ir.transform @ jnp.linalg.inv(init_T))
    trust_ok = np.array(
        (jnp.linalg.norm(delta[:, :3], axis=-1) < 0.25)
        & (jnp.linalg.norm(delta[:, 3:], axis=-1) < 0.25)
        & (ir.fitness > 0.2)
    )
    That_all = jnp.where(trust_ok[:, None, None], ir.transform, init_T)
    infos_init = edge_information_batch(prepped, idx_i, idx_j, init_T, rcfg)
    odo_T = np.array(That_all, np.float64)
    odo_info = np.array(
        jnp.where(jnp.asarray(trust_ok)[:, None, None], infos_ref, infos_init), np.float64
    )
    odo_fitness = np.array(ir.fitness)
    io_logfmt.write_log(
        out / "odometry.log",
        io_logfmt.Trajectory(
            [io_logfmt.TrajectoryEntry(f, f + 1, nf, odo_T[f]) for f in range(nf - 1)]
        ),
    )
    io_logfmt.write_info(
        out / "odometry.info",
        io_logfmt.InfoFile(
            [io_logfmt.InfoEntry(f, f + 1, nf, odo_info[f]) for f in range(nf - 1)]
        ),
    )

    # Suspect odometry edges (tracking-failure repair path — VERDICT r2 #1c):
    # an edge touching a fragment whose tracking health tripped, or whose
    # chain refinement was rejected/poorly matched, cannot be hard-trusted.
    # They are (a) recorded for the pose graph to make line-process-eligible,
    # and (b) re-registered from scratch (FPFH+RANSAC, no odometry init) as
    # additional loop candidates so the graph has an independent measurement.
    suspect = [
        f
        for f in range(nf - 1)
        if health[f].get("suspect", False)
        or health[f + 1].get("suspect", False)
        or not trust_ok[f]
        or odo_fitness[f] < rcfg.min_fitness
    ]
    with open(out / "odometry_suspect.txt", "w") as sf:
        for f in suspect:
            sf.write(f"{f} {f + 1}\n")

    # Loop candidates: all non-adjacent pairs (+ suspect consecutive pairs),
    # batched through the jitted registrar (the reference farmed these across
    # a cluster — SURVEY.md §3.2; dist.pair_sharding shards the same batches
    # over chips).  Each fragment is prepped (downsample/normals/FPFH)
    # exactly once; the pair loop only gathers prepped rows — the reference
    # re-preprocessed both clouds inside every pair job.
    pairs = [(i, j) for i in range(nf) for j in range(i + 2, nf)] if all_pairs else []
    gate_stats: dict = {}
    if all_pairs and (np.isfinite(cfg.loop_candidate_radius) or cfg.loop_gating == "drift"):
        # Fragment centroids under ``gate_poses`` (default: the odometry
        # -chain bases) — the init placement both gates reason about.
        gp = bases if gate_poses is None else np.asarray(gate_poses, np.float32)
        cent = np.zeros((nf, 3), np.float32)
        for f, c in enumerate(clouds):
            m = np.asarray(c.mask)
            local = np.asarray(c.points)[m].mean(0) if m.any() else np.zeros(3)
            cent[f] = gp[f, :3, :3] @ local + gp[f, :3, 3]
    if all_pairs and np.isfinite(cfg.loop_candidate_radius):
        # Legacy manual radius gate (kept as an override; the derived gate
        # below replaced it as the default — VERDICT r4 weak #5).
        pairs = [
            (i, j)
            for i, j in pairs
            if np.linalg.norm(cent[i] - cent[j]) < cfg.loop_candidate_radius
        ]
    elif all_pairs and cfg.loop_gating == "drift" and nf > 2:
        # Derived gate + content retrieval (see PipelineConfig.loop_gating).
        # Clean-path pairs: admit iff the init centroid distance is within
        # the measured overlap reach plus the path's accumulated drift
        # budget.  Suspect-path pairs: init distance is meaningless (the
        # blind stretch can be wrong by meters) — admit by mutual top-k
        # FPFH-signature retrieval instead (registration.retrieval), which
        # depends on CONTENT, not poses.
        from ..registration.retrieval import (
            fragment_signatures,
            mutual_topk_pairs,
            signature_distances,
        )

        sus_edge = np.zeros(nf - 1, bool)
        for f in suspect:
            sus_edge[f] = True
        delta = np.where(sus_edge, cfg.drift_suspect, cfg.drift_per_fragment)
        cum_budget = np.concatenate([[0.0], np.cumsum(delta)])
        cum_sus = np.concatenate([[0], np.cumsum(sus_edge.astype(int))])
        # Overlap test: posed bounding boxes must intersect within the
        # path's drift budget + a fixed slack.  Centroid distance was
        # measured too strict on revisiting trajectories (config4_slac_survey:
        # 62 of 190 genuinely-overlapping pairs admitted — two views of the
        # same wall from different ranges have centroids ~1 m apart); AABB
        # intersection is the overlap criterion itself, not a proxy, and
        # still cuts cross-room aliased pairs whose boxes hug opposite walls.
        lo_b = np.zeros((nf, 3), np.float32)
        hi_b = np.zeros((nf, 3), np.float32)
        for f, c in enumerate(clouds):
            m = np.asarray(c.mask)
            w = (
                np.asarray(c.points)[m] @ gp[f, :3, :3].T + gp[f, :3, 3]
                if m.any()
                else np.zeros((1, 3), np.float32)
            )
            lo_b[f] = w.min(0)
            hi_b[f] = w.max(0)
        admitted, suspect_path = [], set()
        for i, j in pairs:
            if j - i <= cfg.gate_near_diagonal:
                admitted.append((i, j))  # temporally local: always register
            elif cum_sus[j] - cum_sus[i] == 0:
                margin = cfg.gate_margin + (cum_budget[j] - cum_budget[i])
                if np.all(lo_b[i] - margin <= hi_b[j]) and np.all(
                    lo_b[j] - margin <= hi_b[i]
                ):
                    admitted.append((i, j))
            else:
                suspect_path.add((i, j))
        content: set = set()
        if suspect_path:
            sig = np.array(
                fragment_signatures(
                    jax.tree.map(lambda x: x[:nf], prepped).features,
                    jax.tree.map(lambda x: x[:nf], prepped).coarse.mask,
                )
            )
            content = mutual_topk_pairs(
                signature_distances(sig), cfg.retrieval_topk, candidates=suspect_path
            )
        gate_stats = dict(
            gate_margin=cfg.gate_margin,
            gate_admitted=len(admitted),
            gate_suspect_path=len(suspect_path),
            gate_content_admitted=len(content),
        )
        # Content-retrieved candidates get a SECOND registration attempt
        # with an independent RANSAC key (they land in a different batch, so
        # the per-batch key derivation salts them automatically): they are
        # few, high-value (often the only loop closure across a suspect
        # stretch), and typically marginal-overlap — measured: the
        # livingroom2 wrap pair (0,18) registers at fitness 0.278 vs the
        # 0.25 threshold, i.e. one seed's luck from closing the loop.
        # Accepted duplicates are deduped (best fitness wins) before spill.
        pairs = admitted + sorted(content) + sorted(content)
    pairs += [(f, f + 1) for f in suspect]
    t_prep = time.time() - t0  # prep + odometry refine (incl. any compiles)
    batch_results = []
    B = cfg.registration_batch
    key = jax.random.PRNGKey(cfg.seed)
    t_first = None  # set after the first batch call returns (jit compile done)
    n_first = 0
    t_disp0 = time.time()
    for s in range(0, len(pairs), B):
        chunk = pairs[s : s + B]
        pad = B - len(chunk)
        chunk_p = chunk + [chunk[-1]] * pad
        keys = jax.random.split(jax.random.fold_in(key, s), B)
        res = register_prepped_batch(
            prepped,
            jnp.array([i for i, _ in chunk_p], jnp.int32),
            jnp.array([j for _, j in chunk_p], jnp.int32),
            keys,
            cfg.registration,
        )
        batch_results.append((len(chunk), res))  # stays on device — no sync
        if t_first is None:
            # The first call blocks on XLA tracing+compile; timing the warm
            # rate from here excludes it (the dispatched work itself is still
            # queued and lands in the drain below).
            t_first, n_first = time.time(), len(chunk)
    t_dispatch = time.time() - t_disp0  # host-side dispatch loop (async queue)

    t_drain0 = time.time()
    results = []
    for n_valid, res in batch_results:
        host = jax.tree.map(np.array, res)  # single drain at stage end
        for b in range(n_valid):
            results.append(jax.tree.map(lambda x: x[b], host))
    t_drain = time.time() - t_drain0  # device execution backlog + readback

    accepted_all = [r for r in results if bool(r.success)]
    # Dedup duplicate attempts (content retries above): best fitness wins.
    best: dict = {}
    for r in accepted_all:
        k = (int(r.i), int(r.j))
        if k not in best or float(r.fitness) > float(best[k].fitness):
            best[k] = r
    accepted = [best[k] for k in sorted(best)]
    io_logfmt.write_log(
        out / "loop.log",
        io_logfmt.Trajectory(
            [
                io_logfmt.TrajectoryEntry(int(r.i), int(r.j), nf, r.transform.astype(np.float64))
                for r in accepted
            ]
        ),
    )
    io_logfmt.write_info(
        out / "loop.info",
        io_logfmt.InfoFile(
            [
                io_logfmt.InfoEntry(int(r.i), int(r.j), nf, r.information.astype(np.float64))
                for r in accepted
            ]
        ),
    )
    t_total = time.time() - t0
    stats = dict(
        pairs=len(pairs),
        accepted=len(accepted),
        odometry_edges=nf - 1,
        suspect_odometry_edges=len(suspect),
        seconds=round(t_total, 2),
        prep_seconds=round(t_prep, 2),
        # Stage-rate attribution (VERDICT r4 #5): dispatch = host loop
        # queueing async batches (tracing-cache lookups, per-batch transfers);
        # drain = device execution backlog + result readback.  If dispatch
        # dominates, the host cannot feed the chip; if drain dominates, the
        # device compute itself is the limit.
        dispatch_seconds=round(t_dispatch, 2),
        drain_seconds=round(t_drain, 2),
        io_seconds=round(t_total - t_prep - t_dispatch - t_drain, 2),
        pairs_per_second=round((len(pairs) + nf - 1) / max(t_total, 1e-9), 3),
        # Steady-state rate of the pair loop alone (what a warm-cache /
        # multi-scene run achieves): timed from after the first batch call
        # returns, so the one-time XLA compile of register_prepped_batch is
        # excluded (ADVICE r3); the first batch's device work still drains
        # inside the window, so its pairs are excluded from the numerator.
        pair_loop_pairs_per_second=(
            round((len(pairs) - n_first) / max(t_total - (t_first - t0), 1e-9), 3)
            if t_first is not None and len(pairs) > n_first
            else None
        ),
        **gate_stats,
    )
    _log("registration", "done", **stats)
    return stats


# ----------------------------------------------------------------- posegraph


def _gauge_consensus(
    nf: int,
    odo_T: dict,
    loops: list,
    suspect_edges: set,
    pgo_cfg,
    trans_per_suspect: float = 0.75,
) -> tuple[set, dict]:
    """Select the consistent subset of suspect-path-crossing loop edges.

    Splits the fragment chain into components at suspect edges, computes the
    component-alignment gauge each crossing loop edge implies (via healthy
    -only chains), clusters the gauges, rejects clusters whose ROTATION
    disagrees with the full odometry chain beyond the per-suspect-edge
    budget (see PGOConfig gauge_* fields for the measured rationale), and
    returns (set of loop (i, j) to DROP, stats).
    """
    import numpy as np

    comp = np.zeros(nf, int)
    c = 0
    for f in range(nf - 1):
        comp[f] = c
        if f in {a for a, _ in suspect_edges}:
            c += 1
    comp[nf - 1] = c
    # Healthy-only chain poses (per component, rooted at its first fragment)
    # and the full chain (suspect edges included) for the rotation prior.
    cpose = [np.eye(4) for _ in range(nf)]
    fpose = [np.eye(4) for _ in range(nf)]
    for f in range(nf - 1):
        T = np.asarray(odo_T[(f, f + 1)], np.float64)
        fpose[f + 1] = fpose[f] @ T
        cpose[f + 1] = cpose[f] @ T if (f, f + 1) not in suspect_edges else np.eye(4)
    roots = {}
    for f in range(nf):
        roots.setdefault(int(comp[f]), f)

    def rot_angle(R):
        return float(
            np.degrees(np.arccos(np.clip((np.trace(R[:3, :3]) - 1) / 2, -1.0, 1.0)))
        )

    from collections import defaultdict

    by_cc = defaultdict(list)
    n_sus_between = {}
    for i, j, T in loops:
        a, b = int(comp[i]), int(comp[j])
        if a == b:
            continue
        G = cpose[i] @ np.asarray(T, np.float64) @ np.linalg.inv(cpose[j])
        by_cc[(a, b)].append(((i, j), G))
    drop: set = set()
    stats = dict(crossing=0, dropped=0, component_pairs=0)
    for (a, b), lst in by_cc.items():
        stats["component_pairs"] += 1
        stats["crossing"] += len(lst)
        # Rotation budget from the number of suspect edges between the roots.
        ra, rb = roots[a], roots[b]
        lo, hi = min(ra, rb), max(ra, rb)
        n_sus = sum(1 for (x, y) in suspect_edges if lo <= x < hi)
        budget = (
            pgo_cfg.gauge_rot_budget_base
            + pgo_cfg.gauge_rot_budget_per_suspect * n_sus
        )
        t_budget = pgo_cfg.gauge_trans_budget_base + trans_per_suspect * n_sus
        # Chain-implied gauge between the same component frames: component
        # frames are their roots' local frames (cpose[root] = I), so the
        # full chain gives G_chain = inv(fpose[ra]) @ fpose[rb].
        G_chain = np.linalg.inv(fpose[ra]) @ fpose[rb]
        # Greedy clustering by SE3 distance to a representative.
        clusters: list[list] = []
        for e, G in lst:
            placed = False
            for cl in clusters:
                D = np.linalg.inv(cl[0][1]) @ G
                if (
                    np.linalg.norm(D[:3, 3]) < pgo_cfg.gauge_cluster_trans
                    and rot_angle(D) < pgo_cfg.gauge_cluster_rot
                ):
                    cl.append((e, G))
                    placed = True
                    break
            if not placed:
                clusters.append([(e, G)])
        # Reject rotation-inconsistent clusters; keep the largest survivor
        # (and any cluster consistent with IT — conservative: only drop
        # edges in clusters that failed the rotation test or that conflict
        # with the winner).
        ok_clusters = [
            cl
            for cl in clusters
            if rot_angle(np.linalg.inv(G_chain) @ cl[0][1]) <= budget
            and np.linalg.norm((np.linalg.inv(G_chain) @ cl[0][1])[:3, 3]) <= t_budget
        ]
        if not ok_clusters:
            # Nothing passes the chain priors: every crossing edge asserts a
            # component placement the (gyro-grade) chain rotation or the
            # translation drift budget says is impossible — aliased matches.
            # Drop them all and let the chain (+ any consistent edges between
            # OTHER component pairs) place the components.  Measured
            # (livingroom2): keeping them "for the line process to fight"
            # loses — 10 mutually-consistent 179-degree flips outvote the
            # backbone.
            for e, _ in lst:
                drop.add(e)
                stats["dropped"] += 1
            continue
        winner = max(ok_clusters, key=len)
        keep = {e for e, _ in winner}
        for cl in ok_clusters:
            if cl is winner:
                continue
            D = np.linalg.inv(winner[0][1]) @ cl[0][1]
            if (
                np.linalg.norm(D[:3, 3]) < 2 * pgo_cfg.gauge_cluster_trans
                and rot_angle(D) < 2 * pgo_cfg.gauge_cluster_rot
            ):
                keep |= {e for e, _ in cl}
        for e, _ in lst:
            if e not in keep:
                drop.add(e)
                stats["dropped"] += 1
    return drop, stats


def _spanning_tree_init(
    nf: int, ii, jj, Ts, suspect_edges: set, fallback: np.ndarray
) -> np.ndarray:
    """Compose initial poses along a min-cost spanning tree from fragment 0.

    Edge costs: 1 for trusted odometry, 4 for loop edges (pairwise
    registrations are noisier than healthy tracking), 1000 for suspect
    odometry (last-resort connectivity only).  Falls back to the chained
    bases for any fragment unreachable through the edge set.
    """
    import heapq

    adj: list[list[tuple[float, int, np.ndarray]]] = [[] for _ in range(nf)]
    for k in range(len(ii)):
        a, b, T = int(ii[k]), int(jj[k]), np.asarray(Ts[k], np.float64)
        if b - a == 1:
            cost = 1000.0 if (a, b) in suspect_edges else 1.0
        else:
            cost = 4.0
        # T maps b-local into a-local: pose_b = pose_a @ T; inverse for a<-b.
        adj[a].append((cost, b, T))
        adj[b].append((cost, a, np.linalg.inv(T)))
    dist = np.full(nf, np.inf)
    poses = [None] * nf
    poses[0] = np.asarray(fallback[0], np.float64)
    dist[0] = 0.0
    heap = [(0.0, 0)]
    while heap:
        d, a = heapq.heappop(heap)
        if d > dist[a]:
            continue
        for cost, b, T in adj[a]:
            nd = d + cost
            if nd < dist[b]:
                dist[b] = nd
                poses[b] = poses[a] @ T
                heapq.heappush(heap, (nd, b))
    out = np.stack(
        [p if p is not None else np.asarray(fallback[k], np.float64) for k, p in enumerate(poses)]
    )
    return out.astype(np.float32)


def run_posegraph(cfg: PipelineConfig) -> None:
    out = cfg.p_posegraph()
    out.mkdir(parents=True, exist_ok=True)
    reg = cfg.p_registration()
    bases = io_logfmt.read_log(cfg.p_fragments() / "fragments.log").matrices().astype(np.float32)
    odo = io_logfmt.read_log(reg / "odometry.log")
    odo_info = io_logfmt.read_info(reg / "odometry.info")
    loop = io_logfmt.read_log(reg / "loop.log")
    loop_info = io_logfmt.read_info(reg / "loop.info")

    # Suspect odometry edges (flagged by tracking health / rejected chain
    # refinement in run_registration) are NOT hard-trusted: they enter the
    # line process like loop edges, so a broken odometry measurement can be
    # down-weighted instead of dragging the whole graph (VERDICT r2 weak #1 —
    # round 2's robust_pgo bypassed the line process for every odometry edge).
    suspect_path = reg / "odometry_suspect.txt"
    suspect_edges: set[tuple[int, int]] = set()
    if suspect_path.exists():
        for line in suspect_path.read_text().splitlines():
            if line.strip():
                a, b = map(int, line.split())
                suspect_edges.add((a, b))

    # Gauge-consensus pre-filter (round 5): loop edges crossing suspect
    # stretches are clustered by the component-alignment gauge they imply;
    # clusters whose rotation disagrees with the odometry chain beyond the
    # drift budget are dropped BEFORE the line process (see _gauge_consensus
    # and PGOConfig gauge_* for the measured rationale).
    loop_entries = list(loop.entries)
    loop_info_entries = list(loop_info.entries)
    gauge_stats: dict = {}
    if suspect_edges and loop_entries:
        nf_ = len(bases)
        odo_T = {(e.i, e.j): e.transform for e in odo.entries}
        if all((f, f + 1) in odo_T for f in range(nf_ - 1)):
            drop, gauge_stats = _gauge_consensus(
                nf_,
                odo_T,
                [(e.i, e.j, e.transform) for e in loop_entries],
                suspect_edges,
                cfg.posegraph,
                trans_per_suspect=cfg.drift_suspect,
            )
            if drop:
                keep_idx = [
                    k
                    for k, e in enumerate(loop_entries)
                    if (e.i, e.j) not in drop
                ]
                loop_entries = [loop_entries[k] for k in keep_idx]
                loop_info_entries = [loop_info_entries[k] for k in keep_idx]

    ii = [e.i for e in odo.entries] + [e.i for e in loop_entries]
    jj = [e.j for e in odo.entries] + [e.j for e in loop_entries]
    Ts = [e.transform for e in odo.entries] + [e.transform for e in loop_entries]
    # Suspect odometry edges carry DOWNSCALED information in addition to
    # being line-process-eligible: tracking health measured them unreliable,
    # and at full weight a run of mutually-consistent garbage chain edges
    # (a blind bare-wall arc) outweighs the handful of genuine loop edges
    # that actually constrain the two healthy sub-maps — the line process
    # then prunes the TRUTH as the outlier (measured: config3_degenerate
    # healthy-frame ATE 0.84 m with full-weight suspect edges).
    infos = [
        e.info * (cfg.posegraph.suspect_info_scale if (e.i, e.j) in suspect_edges else 1.0)
        for e in odo_info.entries
    ] + [e.info for e in loop_info_entries]
    is_odo = [(e.i, e.j) not in suspect_edges for e in odo.entries] + [False] * len(
        loop_entries
    )
    n_odo = len(odo.entries)
    if not ii:
        # Single-fragment scene: nothing to optimize — pass the fragment base
        # pose straight through so downstream stages still run.
        io_logfmt.write_log(
            out / "pose.log", io_logfmt.Trajectory.from_matrices(bases.astype(np.float64))
        )
        (out / "kept_edges.txt").write_text("")
        _log("posegraph", "done", edges=0, loops=0, loops_kept=0, seconds=0.0)
        return
    edges = EdgeList.build(
        np.array(ii),
        np.array(jj),
        np.stack(Ts).astype(np.float32),
        np.stack(infos).astype(np.float32),
        np.array(is_odo),
    )
    t0 = time.time()
    init = bases
    if suspect_edges:
        # Robust-kernel initialization: the chained-odometry init carries the
        # blind stretch's full drift, so genuine loop edges start meters off
        # and the line process zeroes them before they can pull the graph
        # together (l = (mu/(mu+r^2))^2 with r^2 evaluated AT the init).
        # Re-chain the init along a spanning tree that prefers reliable
        # edges (non-suspect odometry, then loops, then suspect odometry as
        # a last resort), so every measurement starts within its own noise
        # of consistency.
        init = _spanning_tree_init(len(bases), ii, jj, Ts, suspect_edges, bases)
    res = optimize_pose_graph(jnp.asarray(init), edges, cfg.posegraph)
    poses = np.array(res.poses, np.float64)
    io_logfmt.write_log(out / "pose.log", io_logfmt.Trajectory.from_matrices(poses))
    kept = np.array(res.kept)
    with open(out / "kept_edges.txt", "w") as f:
        for k in range(n_odo, len(ii)):
            if kept[k]:
                f.write(f"{ii[k]} {jj[k]}\n")
    _log(
        "posegraph",
        "done",
        edges=len(ii),
        loops=len(loop_entries),
        loops_kept=int(kept[n_odo:].sum()),
        suspect_odometry=len(suspect_edges),
        suspect_odometry_kept=int(kept[:n_odo][~np.array(is_odo[:n_odo])].sum()),
        **{f"gauge_{k}": v for k, v in gauge_stats.items()},
        seconds=round(time.time() - t0, 2),
    )


# ------------------------------------------------------- fragment optimizer


def run_optimize(
    cfg: PipelineConfig, *, spill_corres: bool = False, spill_deformed: bool = False
) -> dict:
    out = cfg.p_slac()
    out.mkdir(parents=True, exist_ok=True)
    clouds = load_fragment_clouds(cfg)
    poses = io_logfmt.read_log(cfg.p_posegraph() / "pose.log").matrices().astype(np.float32)
    edge_pairs = [(0 + f, f + 1) for f in range(len(clouds) - 1)]
    kept_path = cfg.p_posegraph() / "kept_edges.txt"
    if kept_path.exists():
        seen = set(edge_pairs)
        with open(kept_path) as f:
            for line in f:
                i, j = map(int, line.split())
                # Re-registered suspect odometry pairs are consecutive and
                # already present as chain edges — skip duplicates.
                if (i, j) not in seen:
                    edge_pairs.append((i, j))
                    seen.add((i, j))
    t0 = time.time()

    # Pairwise-refined transforms from the registration stage: the reference
    # harvests correspondences at the per-edge re-ICP alignment, not the
    # global poses (BuildCorrespondence — SURVEY.md §3.4; see
    # build_correspondences docstring for why it matters).
    pair_T: dict = {}
    reg = cfg.p_registration()
    for name in ("odometry.log", "loop.log"):
        p = reg / name
        if p.exists():
            for e in io_logfmt.read_log(p).entries:
                pair_T[(e.i, e.j)] = e.transform.astype(np.float32)

    # Viewpoint-baseline row weights (see PipelineConfig.corres_baseline_weight):
    # the distortion differential observable on an edge scales with the angle
    # between the two fragments' optical axes (fragment-local +z), so SLAC
    # calibration runs weight long-baseline loop edges up — derived from the
    # geometry, not hand-set per edge.
    edge_w = None
    if cfg.corres_baseline_weight > 0.0:
        edge_w = {}
        for i, j in edge_pairs:
            cosang = float(np.dot(poses[i][:3, 2], poses[j][:3, 2]))
            edge_w[(i, j)] = 1.0 + cfg.corres_baseline_weight * (1.0 - cosang)

    scfg_pre = cfg.slac_config() if cfg.slac_mode != "none" else None
    lof = None
    if scfg_pre is not None and scfg_pre.mode is SlacMode.NONRIGID:
        lof = list(range(len(clouds)))

    def harvest(cur_poses, displacement=None, max_distance=None):
        from ..elastic.lattice import Lattice

        return build_correspondences(
            clouds,
            jnp.asarray(cur_poses),
            edge_pairs,
            max_distance=cfg.corres_max_distance if max_distance is None else max_distance,
            capacity_per_edge=cfg.corres_capacity_per_edge,
            # Round 1 matches under the pairwise-refined ICP alignments
            # (reference BuildCorrespondence semantics — removes the global
            # -misalignment bias).  Rounds >= 2 default to refined global
            # poses + current warp (the exact-state oracle's alignment);
            # corres_reassoc_pair_transforms keeps pair_T instead — measured
            # better for NONRIGID (the per-edge ICP absorbs each edge's
            # rigid warp component).  See PipelineConfig.
            pair_transforms=(
                pair_T
                if displacement is None or cfg.corres_reassoc_pair_transforms
                else None
            ),
            edge_weights=edge_w,
            lattice=(
                None
                if displacement is None or scfg_pre is None
                else Lattice(scfg_pre.resolution, scfg_pre.length, scfg_pre.origin)
            ),
            displacement=displacement,
            lattice_of_fragment=lof,
        )

    corres = harvest(poses)
    if spill_corres:
        cdir = Path(cfg.out_dir) / "corres"
        cdir.mkdir(parents=True, exist_ok=True)
        cap = cfg.corres_capacity_per_edge
        for e, (i, j) in enumerate(edge_pairs):
            m = np.array(corres.mask[e * cap : (e + 1) * cap])
            # Spill as point pairs (the array-native analog of index pairs).
            pq = np.concatenate(
                [
                    np.array(corres.p[e * cap : (e + 1) * cap])[m],
                    np.array(corres.q[e * cap : (e + 1) * cap])[m],
                ],
                axis=1,
            )
            np.savetxt(cdir / f"corres_{i}_{j}.txt", pq, fmt="%.6f")
    _log("optimize", "correspondences", count=int(np.array(corres.count())), edges=len(edge_pairs))

    if cfg.slac_mode == "none":
        io_logfmt.write_log(out / "pose_slac.log", io_logfmt.Trajectory.from_matrices(poses))
        _log("optimize", "skipped (mode=none)")
        return {"mode": "none"}
    scfg = cfg.slac_config()
    def round_scfg(r: int):
        """Per-round config: ARAP annealing (see PipelineConfig.arap_anneal)."""
        if cfg.arap_anneal == 1.0:
            return scfg
        scale = cfg.arap_anneal ** (cfg.corres_rounds - 1 - r)
        return scfg._replace(arap_weight=scfg.arap_weight * scale)

    res = optimize_fragments(
        jnp.asarray(poses), corres, round_scfg(0), num_fragments=len(clouds)
    )
    for r in range(1, cfg.corres_rounds):
        # Re-associate at the refined state and continue from it (ICCV'13
        # alternation — see PipelineConfig.corres_rounds).  The refined
        # LATTICE is composed into the matching (points are warped before the
        # mutual-NN pass; ADVICE r4 #2: with pair_transforms covering every
        # edge, re-harvesting at refined poses alone returns identical
        # matches), and the association radius tightens per round
        # (corres_distance_decay) as the estimate converges.
        md = cfg.corres_max_distance * cfg.corres_distance_decay**r
        corres = harvest(
            np.array(res.poses, np.float32),
            displacement=np.array(res.displacement, np.float32),
            max_distance=md,
        )
        res = optimize_fragments(
            res.poses,
            corres,
            round_scfg(r),
            num_fragments=len(clouds),
            init_displacement=res.displacement,
        )
        _log(
            "optimize",
            "alternation round",
            round=r + 1,
            corres=int(np.array(corres.count())),
            rmse=float(res.final_rmse),
        )
    io_logfmt.write_log(
        out / "pose_slac.log",
        io_logfmt.Trajectory.from_matrices(np.array(res.poses, np.float64)),
    )
    rest = np.array(res.lattice.rest_positions())
    disp = np.array(res.displacement)
    if scfg.mode is SlacMode.NONRIGID:
        for f in range(disp.shape[0]):
            io_logfmt.write_ctr(out / f"ctr_{f}.txt", rest + disp[f], scfg.resolution, scfg.length)
    else:
        io_logfmt.write_ctr(out / "ctr.txt", rest + disp[0], scfg.resolution, scfg.length)
    if spill_deformed:
        # Reference FragmentOptimizer's optional deformed cloud dump
        # (SURVEY.md §3.4): each fragment cloud through its lattice warp, in
        # the fragment-local frame.  Normals are carried over unwarped (the
        # warp is near-rigid at lattice scale; exact normal transport would
        # need the warp Jacobian).
        from ..elastic.lattice import deform

        for f, c in enumerate(clouds):
            m = np.array(c.mask)
            d = jnp.asarray(disp[f if scfg.mode is SlacMode.NONRIGID else 0])
            warped = np.array(deform(res.lattice, d, c.points))
            io_logfmt.write_xyzn(
                out / f"deformed_{f}.xyzn", warped[m], np.array(c.normals)[m]
            )
    stats = dict(
        mode=cfg.slac_mode,
        rmse_before=float(res.data_rmse[0]),
        rmse_after=float(res.final_rmse),
        seconds=round(time.time() - t0, 2),
    )
    _log("optimize", "done", **stats)
    return stats


# ------------------------------------------------------------------ integrate


def _frame_world_poses(cfg: PipelineConfig):
    """(frame poses (T,4,4), fragment index per frame, local poses (T,4,4))."""
    frag_dir = cfg.p_fragments()
    pose_path = cfg.p_slac() / "pose_slac.log"
    if not pose_path.exists():
        pose_path = cfg.p_posegraph() / "pose.log"
    if not pose_path.exists():
        pose_path = frag_dir / "fragments.log"
    bases = io_logfmt.read_log(pose_path).matrices().astype(np.float32)
    K = cfg.frames_per_fragment
    frames, fidx, locals_ = [], [], []
    for f in range(len(bases)):
        local = io_logfmt.read_log(frag_dir / f"local_{f}.log").matrices().astype(np.float32)
        for k in range(K):  # overlap frame belongs to the next fragment
            frames.append(bases[f] @ local[k])
            fidx.append(f)
            locals_.append(local[k])
    return np.stack(frames), np.array(fidx), np.stack(locals_), bases


def run_integrate(ds: Dataset, cfg: PipelineConfig) -> None:
    """Scene TSDF integration + meshing over a block-grid volume.

    Scenes larger than ``scene_max_shape`` are tiled into overlapping blocks
    (integrate.blocks) instead of being clamped: each block fuses only the
    frames whose fragment surface intersects it, meshes are extracted per
    block, and owned-region filtering stitches them seamlessly (reference:
    kinfu_largeScale's shifting volume — SURVEY.md §1 L6).
    """
    from ..integrate import blocks as blocks_mod

    out = cfg.p_integrate()
    out.mkdir(parents=True, exist_ok=True)
    frame_poses, fidx, local_poses, bases = _frame_world_poses(cfg)
    n = min(len(ds), len(frame_poses))
    intr = ds.intrinsics

    # Volume bounds: global + per-fragment (for per-block frame culling).
    clouds = load_fragment_clouds(cfg)
    frag_lo = np.full((len(clouds), 3), np.inf)
    frag_hi = np.full((len(clouds), 3), -np.inf)
    for f, c in enumerate(clouds):
        m = np.array(c.mask)
        if not m.any():
            continue
        w = np.array(se3.apply(jnp.asarray(bases[f]), c.points))[m]
        frag_lo[f] = w.min(0)
        frag_hi[f] = w.max(0)
    margin = 4 * cfg.scene_voxel_size
    lo = frag_lo.min(0) - margin
    hi = frag_hi.max(0) + margin
    want = tuple(int(np.ceil((hi[a] - lo[a]) / cfg.scene_voxel_size) + 1) for a in range(3))
    plan = blocks_mod.plan_blocks(
        want, cfg.scene_max_shape, overlap=cfg.scene_block_overlap
    )
    scfg = SceneConfig(
        volume_shape=plan.tile_shape, voxel_size=cfg.scene_voxel_size, origin=tuple(lo)
    )
    _log(
        "integrate",
        "volume plan",
        wanted=list(want),
        tile=list(plan.tile_shape),
        blocks=len(plan.blocks),
        origin=[round(v, 3) for v in lo],
    )

    # Lattice correction if the optimizer produced one.
    slac_dir = cfg.p_slac()
    use_lattice = cfg.slac_mode in ("slac", "nonrigid") and (
        (slac_dir / "ctr.txt").exists() or (slac_dir / "ctr_0.txt").exists()
    )
    disp_per_frag = None
    lat = None
    if use_lattice:
        from ..elastic.lattice import Lattice

        scfg_s = cfg.slac_config()
        lat = Lattice(scfg_s.resolution, scfg_s.length, scfg_s.origin)
        rest = np.array(lat.rest_positions())
        if (slac_dir / "ctr.txt").exists():
            pos, _, _ = io_logfmt.read_ctr(slac_dir / "ctr.txt")
            disp_per_frag = np.tile((pos - rest)[None], (len(bases), 1, 1)).astype(np.float32)
        else:
            ds_ = []
            for f in range(len(bases)):
                pos, _, _ = io_logfmt.read_ctr(slac_dir / f"ctr_{f}.txt")
                ds_.append(pos - rest)
            disp_per_frag = np.stack(ds_).astype(np.float32)

    from ..integrate.scene import integrate_frames_scatter, integrate_frames_slac_scatter

    fuse_rigid = integrate_frames_scatter if cfg.scene_use_scatter else integrate_frames
    fuse_slac = (
        integrate_frames_slac_scatter if cfg.scene_use_scatter else integrate_frames_slac
    )

    def fuse_frames(vol, start, count):
        """Fuse contiguous frames [start, start+count) into vol."""
        depths = jnp.asarray(ds.depth_chunk(start, count))
        c = depths.shape[0]
        if use_lattice:
            return fuse_slac(
                vol,
                depths,
                jnp.asarray(np.stack([bases[fidx[start + k]] for k in range(c)])),
                jnp.asarray(local_poses[start : start + c]),
                jnp.asarray(np.stack([disp_per_frag[fidx[start + k]] for k in range(c)])),
                lat,
                intr,
                scfg,
            )
        return fuse_rigid(
            vol, depths, jnp.asarray(frame_poses[start : start + c]), intr, scfg
        )

    t0 = time.time()
    chunk = 16
    multi = len(plan.blocks) > 1
    frame_lo = frag_lo[fidx[:n]]
    frame_hi = frag_hi[fidx[:n]]
    soup = []
    frames_fused = 0
    for blk in plan.blocks:
        vol = tsdf_mod.make_volume(
            plan.tile_shape, cfg.scene_voxel_size, blk.world_origin(lo, cfg.scene_voxel_size)
        )
        if multi:
            sel = blocks_mod.cull_frames(
                blk, plan, lo, cfg.scene_voxel_size, frame_lo, frame_hi, margin=0.5
            )
        else:
            sel = np.ones(n, bool)
        idxs = np.nonzero(sel)[0]
        # Fuse contiguous runs of selected frames in jitted chunks.
        run_start = None
        runs = []
        for k in idxs:
            if run_start is None:
                run_start, prev = int(k), int(k)
            elif k == prev + 1:
                prev = int(k)
            else:
                runs.append((run_start, prev + 1))
                run_start, prev = int(k), int(k)
        if run_start is not None:
            runs.append((run_start, prev + 1))
        for a, b2 in runs:
            for s in range(a, b2, chunk):
                vol = fuse_frames(vol, s, min(chunk, b2 - s))
        frames_fused += len(idxs)
        tris, mask = extract_mesh(vol, capacity_per_slab=cfg.mesh_capacity_per_slab)
        if multi:
            t_np, m_np = blocks_mod.filter_owned_triangles(
                np.array(tris), np.array(mask), blk, plan, lo, cfg.scene_voxel_size
            )
            soup.append(t_np)
            _log(
                "integrate",
                "block",
                index=list(blk.index),
                frames=len(idxs),
                triangles=int(m_np.sum()),
            )
        else:
            t_np = np.asarray(tris).reshape(-1, 3, 3)[np.asarray(mask).reshape(-1)]
            soup.append(t_np)
    fps = frames_fused / max(time.time() - t0, 1e-9)
    _log("integrate", "fused", frames=n, frame_fusions=frames_fused, frames_per_second=round(fps, 2))

    all_tris = np.concatenate(soup, axis=0) if soup else np.zeros((0, 3, 3), np.float32)
    v, f = mesh_mod.weld_mesh(all_tris, np.ones(len(all_tris), bool))
    io_logfmt.write_ply_mesh(out / "mesh.ply", v, f)
    io_logfmt.write_log(
        out / "trajectory.log",
        io_logfmt.Trajectory.from_matrices(frame_poses[:n].astype(np.float64)),
    )
    _log("integrate", "done", vertices=len(v), faces=len(f))


# ------------------------------------------------------------------ evaluate


def run_make_gt_benchmark(ds: Dataset, cfg: PipelineConfig) -> None:
    """Derive the registration gt.log/gt.info pair benchmark (reference C7).

    The augmented ICL-NUIM benchmark ships these files; when running on
    synthetic data they are derived from the gt trajectory + fragment clouds
    (eval.gt_benchmark) and spilled next to the registration outputs so the
    P/R evaluation reads the same file formats the reference toolbox does.
    """
    from ..eval import gt_benchmark as gtb

    assert ds.gt_poses is not None, "dataset has no gt.log"
    out = cfg.p_registration()
    out.mkdir(parents=True, exist_ok=True)
    clouds = load_fragment_clouds(cfg)
    # Overlap testing only needs registration-scale resolution; full
    # production clouds (131k points) would make the O(F^2) NN sweep here
    # dominate the whole evaluation.
    from ..kernels import voxel_grid as _voxel

    rcfg = cfg.registration
    clouds = [
        _voxel.voxel_downsample(c, rcfg.icp_voxel_size, rcfg.fine_capacity) for c in clouds
    ]
    frag_poses = gtb.gt_fragment_poses(ds.gt_poses, cfg.frames_per_fragment, len(clouds))
    edges, infos = gtb.make_gt_edges(
        clouds,
        frag_poses,
        max_distance=cfg.registration.inlier_threshold,
        capacity=cfg.corres_capacity_per_edge,
    )
    gtb.write_gt_benchmark(out, edges, infos, len(clouds))
    # Provenance gate (VERDICT r2 weak #6): the benchmark's overlap geometry
    # comes from RECONSTRUCTED fragment clouds (gt poses, but within-fragment
    # odometry shapes) — on a run with corrupted tracking the benchmark
    # itself inherits the corruption.  Record which fragments were suspect so
    # P/R numbers scored against this benchmark carry their caveat.
    health = load_fragment_health(cfg, len(clouds))
    suspects = [h["fragment"] for h in health if h.get("suspect", False)]
    with open(out / "gt_benchmark_health.json", "w") as hf:
        json.dump(
            {"suspect_fragments": suspects, "num_fragments": len(clouds)}, hf, indent=2
        )
    _log(
        "evaluate",
        "gt benchmark",
        gt_edges=len(edges),
        suspect_fragments=len(suspects),
    )


def run_evaluate(ds: Dataset, cfg: PipelineConfig) -> dict:
    traj_path = cfg.p_integrate() / "trajectory.log"
    est = io_logfmt.read_log(traj_path).matrices().astype(np.float32)
    assert ds.gt_poses is not None, "dataset has no gt.log"
    n = min(len(est), len(ds.gt_poses))
    res = ate_mod.absolute_trajectory_error(jnp.asarray(est[:n]), jnp.asarray(ds.gt_poses[:n]))
    metrics = {
        "ate_rmse": float(res.rmse),
        "ate_mean": float(res.mean),
        "ate_median": float(res.median),
        "ate_max": float(res.max),
        "frames": n,
    }
    with open(cfg.p_integrate() / "ate.json", "w") as f:
        json.dump(metrics, f, indent=2)

    # Registration precision/recall vs the gt pair benchmark (reference's
    # Matlab registration evaluation — SURVEY.md §3.6).  Scores the raw
    # GlobalRegistration proposals (loop.log), i.e. BEFORE line-process
    # pruning, matching the CVPR'15 protocol (low precision is by design).
    reg = cfg.p_registration()
    if ds.gt_poses is not None and (reg / "loop.log").exists():
        from ..eval import gt_benchmark as gtb
        from ..eval import registration_pr as prmod

        if not (reg / "gt.log").exists():
            run_make_gt_benchmark(ds, cfg)
        gt_edges, gt_infos = gtb.read_gt_benchmark(reg)
        loop = io_logfmt.read_log(reg / "loop.log")
        est_edges = [(e.i, e.j, e.transform) for e in loop.entries]
        pr = prmod.precision_recall(est_edges, gt_edges, gt_infos)
        with open(reg / "registration_pr.json", "w") as f:
            json.dump(pr, f, indent=2)
        metrics.update({"registration_precision": pr["precision"], "registration_recall": pr["recall"]})
        _log("evaluate", "registration P/R", **pr)
    _log("evaluate", "done", **metrics)
    return metrics


def run_all(ds: Dataset, cfg: PipelineConfig) -> dict:
    run_fragments(ds, cfg)
    run_registration(cfg)
    run_posegraph(cfg)
    run_optimize(cfg)
    run_integrate(ds, cfg)
    return run_evaluate(ds, cfg) if ds.gt_poses is not None else {}
