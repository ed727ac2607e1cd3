"""Fat-leaf traversal simulator on CAPTURED bench-scene rays.

Exact lockstep emulation of the windowed sub-packet kernel
(_closest_kernel_win) over trees with LEAF_SIZE in {8..128}, replaying the
REAL ray buffers captured from a Sponza-class 1080p launch
(tools/capture_rays.py), with optional stronger ray sorting. Reports per
2048-ray tile: outer rounds, window steps, drain rounds and drain
(row,leaf) pairs — the counts that multiply the measured per-component
costs (C_round=533, C_step=262, VPU C_drain=3506 @T=8 from the round-2
fit; MXU C_pair(T) from tools/bench_mxu.py).

Usage:
  python tools/sim_fatleaf.py /tmp/bench_rays.npz [--phase=closest|anyhit]
      [--leaf=8,32,64] [--sort=octant,morton] [--tiles=48] [--S=3] [--Q=8]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

R = 16  # rows per tile
S_DEF = 3
Q_DEF = 8


def world_tris():
    """Bench-scene world-space triangles, host-only (no device upload)."""
    from tools.make_sponza import build_scene

    parsed = build_scene()
    vertices = parsed.vertices()
    meshes = {m.id: m for m in parsed.meshes()}
    transforms = parsed.transforms()
    vpos = np.stack([v.vv for v in vertices])
    out = []
    for inst in parsed.instances():
        mesh = meshes.get(inst.mesh_id)
        if mesh is None:
            continue
        t4 = transforms[inst.transform_id].m
        idx = np.asarray(mesh.indices, np.int64).reshape(-1, 3)
        p = vpos[idx] @ t4[:3, :3].T + t4[:3, 3]
        out.append(p.astype(np.float32))
    return np.concatenate(out)


def build_tree(tv, leaf_size):
    from glaze_tpu.accel import bvh as bvh_mod

    return bvh_mod.build_host_octants(tv, leaf_size)


def morton_key(o, d, bmin, extent):
    q = np.clip(((o - bmin) / extent * 31.0).astype(np.int64), 0, 31)

    def spread(x):
        x = (x | (x << 8)) & 0x100F
        x = (x | (x << 4)) & 0x10C3
        x = (x | (x << 2)) & 0x1249
        return x

    m = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    octant = ((d[:, 0] >= 0).astype(np.int64)
              | ((d[:, 1] >= 0).astype(np.int64) << 1)
              | ((d[:, 2] >= 0).astype(np.int64) << 2))
    return (octant << 15) | m


def octant_key(d):
    return ((d[:, 0] >= 0).astype(np.int64)
            | ((d[:, 1] >= 0).astype(np.int64) << 1)
            | ((d[:, 2] >= 0).astype(np.int64) << 2))


def emulate_tile_closest(oct_t, o, d, oct_, S, Q):
    """Counts (rounds, steps, drain_rounds, drain_pairs) for one tile."""
    bmn, bmx = oct_t["bmin"][oct_], oct_t["bmax"][oct_]
    fst, skp = oct_t["first"][oct_], oct_t["skip"][oct_]
    m = bmn.shape[0]
    o = o.reshape(R, 128, 3).astype(np.float32)
    d = d.reshape(R, 128, 3).astype(np.float32)
    inv = np.where(np.abs(d) < 1e-20, 1e20, 1.0 / np.where(d == 0, 1, d))
    t_best = np.full((R, 128), np.inf, np.float32)
    ptr = np.zeros(R, np.int64)
    queue = [[] for _ in range(R)]
    rounds = steps = drain_rounds = drain_pairs = 0

    def slab_rows(rows, nodes):
        t0 = (bmn[nodes][:, None] - o[rows]) * inv[rows]
        t1 = (bmx[nodes][:, None] - o[rows]) * inv[rows]
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        hit = (tn <= tf) & (tf >= 1e-4) & (tn <= t_best[rows])
        return hit, tf

    def do_drain():
        nonlocal drain_rounds, drain_pairs, t_best
        while any(queue):
            drain_rounds += 1
            rows = [r for r in range(R) if queue[r]]
            nodes = np.asarray([queue[r].pop(0) for r in rows])
            drain_pairs += len(rows)
            hit, tf = slab_rows(np.asarray(rows), nodes)
            upd = np.where(hit, np.minimum(t_best[rows],
                                           np.maximum(tf, 0)), t_best[rows])
            t_best[np.asarray(rows)] = upd

    while (ptr < m).any() or any(queue):
        rounds += 1
        win = np.minimum(ptr, m - 1) // 16
        for _ in range(S):
            act = [r for r in range(R)
                   if ptr[r] < m and ptr[r] // 16 == win[r]
                   and len(queue[r]) < Q]
            if not act:
                break
            steps += 1
            rows = np.asarray(act)
            nodes = ptr[rows]
            hit, _ = slab_rows(rows, nodes)
            anyh = hit.any(1)
            for j, r in enumerate(act):
                p = ptr[r]
                leaf = fst[p] >= 0
                if leaf and anyh[j]:
                    queue[r].append(p)
                    ptr[r] = skp[p]
                elif anyh[j]:
                    ptr[r] = p + 1
                else:
                    ptr[r] = skp[p]
        if any(len(q) >= Q for q in queue) or not (ptr < m).any():
            do_drain()
    return rounds, steps, drain_rounds, drain_pairs


def emulate_tile_anyhit(oct_t, o, d, tmax, active, oct_, S, Q):
    bmn, bmx = oct_t["bmin"][oct_], oct_t["bmax"][oct_]
    fst, skp = oct_t["first"][oct_], oct_t["skip"][oct_]
    m = bmn.shape[0]
    o = o.reshape(R, 128, 3).astype(np.float32)
    d = d.reshape(R, 128, 3).astype(np.float32)
    tmax = tmax.reshape(R, 128).astype(np.float32)
    blocked = ~active.reshape(R, 128)
    inv = np.where(np.abs(d) < 1e-20, 1e20, 1.0 / np.where(d == 0, 1, d))
    ptr = np.zeros(R, np.int64)
    queue = [[] for _ in range(R)]
    rounds = steps = drain_rounds = drain_pairs = 0

    def slab_rows(rows, nodes):
        cap = np.where(blocked[rows], -1.0, tmax[rows])
        t0 = (bmn[nodes][:, None] - o[rows]) * inv[rows]
        t1 = (bmx[nodes][:, None] - o[rows]) * inv[rows]
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        return (tn <= tf) & (tf >= 1e-4) & (tn <= cap)

    def do_drain():
        nonlocal drain_rounds, drain_pairs, blocked
        while any(queue):
            drain_rounds += 1
            rows = [r for r in range(R) if queue[r]]
            nodes = np.asarray([queue[r].pop(0) for r in rows])
            drain_pairs += len(rows)
            hit = slab_rows(np.asarray(rows), nodes)
            # approximate: a slab hit on the leaf box blocks the lane with
            # probability ~ leaf occlusion; use hit as stand-in (optimistic
            # blocking, identical across designs)
            blocked[np.asarray(rows)] |= hit

    while (ptr < m).any() or any(queue):
        rounds += 1
        win = np.minimum(ptr, m - 1) // 16
        for _ in range(S):
            act = [r for r in range(R)
                   if ptr[r] < m and ptr[r] // 16 == win[r]
                   and len(queue[r]) < Q]
            if not act:
                break
            steps += 1
            rows = np.asarray(act)
            hit = slab_rows(rows, ptr[rows])
            anyh = hit.any(1)
            for j, r in enumerate(act):
                p = ptr[r]
                leaf = fst[p] >= 0
                if leaf and anyh[j]:
                    queue[r].append(p)
                    ptr[r] = skp[p]
                elif anyh[j]:
                    ptr[r] = p + 1
                else:
                    ptr[r] = skp[p]
        if any(len(q) >= Q for q in queue) or not (ptr < m).any():
            do_drain()
        done = blocked.all(1) & np.asarray([not queue[r] for r in range(R)])
        ptr[done] = m
    return rounds, steps, drain_rounds, drain_pairs


# measured constants (round-2 fit + tools/bench_mxu.py)
C_ROUND = 533.0
C_STEP = 262.0
C_DRAIN_VPU8 = 3506.0  # per drain round (16 rows dense), T=8


def main():
    npz = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_rays.npz"
    phase = "closest"
    leaves = [8, 32, 64]
    sorts = ["octant", "morton"]
    n_tiles = 48
    S, Q = S_DEF, Q_DEF
    cpair = {}
    for a in sys.argv[2:]:
        if a.startswith("--phase="):
            phase = a.split("=")[1]
        elif a.startswith("--leaf="):
            leaves = [int(x) for x in a.split("=")[1].split(",")]
        elif a.startswith("--sort="):
            sorts = a.split("=")[1].split(",")
        elif a.startswith("--tiles="):
            n_tiles = int(a.split("=")[1])
        elif a.startswith("--S="):
            S = int(a.split("=")[1])
        elif a.startswith("--Q="):
            Q = int(a.split("=")[1])
        elif a.startswith("--cpair="):  # e.g. --cpair=32:450,64:900
            for kv in a.split("=")[1].split(","):
                k, v = kv.split(":")
                cpair[int(k)] = float(v)

    data = np.load(npz)
    keys = sorted(k[:-2] for k in data.files if k.endswith(".o"))
    sel = [k for k in keys if phase in k]
    assert sel, f"phase {phase} not in {keys}"
    tag = sel[0]
    o = data[tag + ".o"].astype(np.float32)
    d = data[tag + ".d"].astype(np.float32)
    tmax = data.get(tag + ".tmax")
    active = data.get(tag + ".active")
    if active is None:
        active = np.ones(len(o), bool)
    else:
        active = active.astype(bool)
    if tmax is None:
        tmax = np.full(len(o), np.inf, np.float32)
    print(f"phase {tag}: {len(o)} rays, active {active.mean():.2f}")

    tv = world_tris()
    print(f"scene: {len(tv)} tris")
    bmin = tv.min((0, 1))
    extent = np.maximum(tv.max((0, 1)) - bmin, 1e-20)

    rng = np.random.default_rng(1)
    for sort in sorts:
        if sort == "octant":
            perm = np.argsort(octant_key(d), kind="stable")
        elif sort == "morton":
            perm = np.argsort(morton_key(o, d, bmin, extent), kind="stable")
        elif sort == "active":
            perm = np.argsort(
                (~active).astype(np.int64) * (1 << 40)
                + morton_key(o, d, bmin, extent), kind="stable")
        else:
            perm = np.arange(len(o))
        os_, ds_ = o[perm], d[perm]
        ts_, as_ = tmax[perm], active[perm]
        total_tiles = len(o) // 2048
        tiles = rng.choice(total_tiles, min(n_tiles, total_tiles),
                           replace=False)
        for T in leaves:
            oct_t = build_tree(tv, T)
            agg = np.zeros(4)
            for tix in tiles:
                sl = slice(tix * 2048, (tix + 1) * 2048)
                dd = ds_[sl]
                oct_ = (int((dd[:, 0] >= 0).mean() >= 0.5)
                        + 2 * int((dd[:, 1] >= 0).mean() >= 0.5)
                        + 4 * int((dd[:, 2] >= 0).mean() >= 0.5))
                if phase == "closest":
                    r_ = emulate_tile_closest(oct_t, os_[sl], dd, oct_, S, Q)
                else:
                    r_ = emulate_tile_anyhit(oct_t, os_[sl], dd, ts_[sl],
                                             as_[sl], oct_, S, Q)
                agg += np.asarray(r_)
            agg /= len(tiles)
            rounds, steps, drounds, dpairs = agg
            cyc_vpu = (rounds * C_ROUND + steps * C_STEP
                       + drounds * C_DRAIN_VPU8 * (T / 8.0))
            line = (f"  sort={sort:7s} T={T:3d}: rounds={rounds:7.1f} "
                    f"steps={steps:7.1f} drain_rounds={drounds:6.1f} "
                    f"pairs={dpairs:7.1f}")
            if T == 8:
                est = (rounds * C_ROUND + steps * C_STEP
                       + drounds * C_DRAIN_VPU8)
                line += f"  est_vpu={est/940:7.1f}us/tile"
            if T in cpair:
                est = (rounds * C_ROUND + steps * C_STEP
                       + dpairs * cpair[T])
                line += f"  est_mxu={est/940:7.1f}us/tile"
            print(line, flush=True)


if __name__ == "__main__":
    main()
