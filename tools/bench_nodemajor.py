"""Prices the node-major breadth-first traversal family (VERDICT r3 #4b).

The round-3 cost model bounds the classic packet walk at a 5.8x
row-union factor over the per-ray optimum and concedes the remaining
~2.8x of headroom to "no scheduler can get it" — without ever measuring
a full node-major formulation (only leaf-major drain coalescing was
priced). This tool runs the honest A/B: a breadth-first (ray, node)
frontier traversal in XLA that bins rays to frontier nodes each level
with the same global-sort machinery the Morton trace sort already pays
for, against the production sorted packet trace on the SAME captured
bench-mix rays.

Deliberately biased IN FAVOR of node-major, so a loss is conclusive:
  * t-caps are seeded with the TRUE closest-hit distances (perfect
    occlusion culling — better than any real traversal achieves);
  * leaf drains are EXCLUDED from its timing (only counted): the
    skeleton (gathers + slab tests + per-level sort/compaction) is a
    strict lower bound on any node-major implementation;
  * visits are per-ray exact (no unions at all).

Run (TPU): python tools/bench_nodemajor.py [n_rays=1000000]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

WIDTH, HEIGHT = 1920, 1080
MAX_LEVELS = 48
CAP_PER_RAY = 4  # frontier capacity = CAP_PER_RAY * n_rays pairs


def capture_bounce_rays():
    """(o, d, t_true) of the steady-state closest phase on the bench
    scene + the classic sorted-trace baseline time (bench.py's exact
    methodology)."""
    from glaze_tpu.render import integrator as integ
    from glaze_tpu.render.renderer import RayTraceRenderer
    from tools.make_sponza import build_scene

    r = RayTraceRenderer(build_scene(), width=WIDTH, height=HEIGHT, seed=3)
    c2w, s2c = integ.camera_matrices(r.camera, WIDTH, HEIGHT)
    c2w, s2c = jnp.asarray(c2w), jnp.asarray(s2c)
    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    kw = dict(width=WIDTH, height=HEIGHT, is_persp=True, direct_only=False,
              steps=2, alpha_rounds=r._alpha_rounds,
              coherent=0)  # the INCOHERENT mix: the family's target
    state = integ.init_state(WIDTH, HEIGHT)
    seeds = jnp.asarray(rng.integers(0, 2**32, 2, dtype=np.uint32))
    offs = jnp.asarray(rng.random((2, 2), np.float32))
    state = integ.render_steps(r.scene, state, seeds, offs, c2w, s2c, **kw)
    jax.block_until_ready(state.count)

    px, py, rng_py = integ.sif_lanes(WIDTH, HEIGHT, 1)
    size = jnp.asarray([WIDTH, HEIGHT], jnp.float32)
    names = []

    def step_capture(scene, st, seed, offset):
        sink = []
        integ._capture_sink = sink
        try:
            integ.launch_step(scene, st, seed, offset, c2w, s2c, px, py,
                              size, is_persp=True, direct_only=False,
                              alpha_rounds=r._alpha_rounds, rng_py=rng_py,
                              coherent=0)
        finally:
            integ._capture_sink = None
        del names[:]
        names.extend(rec.pop("phase") for rec in sink)
        return sink

    sink = jax.jit(step_capture)(
        r.scene, state, jnp.uint32(rng.integers(0, 2**32)),
        jnp.asarray(rng.random(2, np.float32)))
    jax.block_until_ready(sink)
    bufs = dict(zip(names, sink))
    bo = bufs["closest"]

    def sync(x):
        return np.asarray(jax.device_get(x[:1]))

    # classic baseline on the captured mix (bench timed_phase pattern)
    def classic(eps):
        return integ.trace_alpha_sorted(
            r.scene, tuple(c + eps for c in bo["o"]), bo["d"],
            alpha_rounds=r._alpha_rounds)["t"]

    sync(classic(1e-5 * float(rng.random())))
    t_classic = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(classic(1e-5 * float(rng.random())))
        t_classic = min(t_classic, time.perf_counter() - t0)

    t_true = integ.trace_alpha_sorted(r.scene, bo["o"], bo["d"],
                                      alpha_rounds=0)["t"]
    return r, bo["o"], bo["d"], t_true, t_classic


def main():
    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    r, o, d, t_true, t_classic = capture_bounce_rays()
    n_all = int(o[0].shape[0])
    print(f"captured {n_all} bounce-mix rays; classic sorted trace "
          f"{t_classic*1e3:.1f} ms ({n_all/t_classic/1e6:.2f} Mrays/s)")

    # flat node arrays (children: left = i+1, right = skip[i+1])
    from glaze_tpu.accel.bvh import build_host
    from glaze_tpu.scene import flatten as fl

    tri = np.asarray(jax.device_get(r.scene.tri_pos_orig)) \
        if hasattr(r.scene, "tri_pos_orig") else None
    if tri is None:
        raise SystemExit("scene lacks tri_pos_orig")
    flat = build_host(tri.reshape(-1, 3, 3))
    m = flat["bmin"].shape[0]
    skip = flat["skip"].astype(np.int64)
    first = flat["first"]
    is_leaf_np = first >= 0
    right_np = np.where(is_leaf_np, 0,
                        skip[np.minimum(np.arange(m) + 1, m - 1)])
    packed = np.zeros((m, 8), np.float32)
    packed[:, 0:3] = flat["bmin"]
    packed[:, 3:6] = flat["bmax"]
    packed[:, 6] = right_np.astype(np.float32)  # right child id (internal)
    packed[:, 7] = np.where(is_leaf_np, flat["count"], -1.0)
    nodes = jnp.asarray(packed)

    # random subset of the mix (the Morton head overstates coherent wins)
    rng = np.random.default_rng(7)
    sel = np.sort(rng.choice(n_all, size=min(n_req, n_all), replace=False))
    n = sel.size
    sel_j = jnp.asarray(sel)
    O = jnp.stack([c[sel_j] for c in o], 1)  # (n, 3)
    D = jnp.stack([c[sel_j] for c in d], 1)
    tiny = jnp.abs(D) < 1e-20
    INV = jnp.where(tiny, 1e20, 1.0 / jnp.where(tiny, 1.0, D))
    TCAP = t_true[sel_j] + 1e-3  # perfect occlusion culling

    cap = CAP_PER_RAY * n

    def bfs(o_arr, inv_arr, tcap_arr):
        ray = jnp.arange(cap, dtype=jnp.int32) % n
        node = jnp.zeros(cap, jnp.int32)
        alive = jnp.arange(cap) < n  # one root pair per ray
        visits = jnp.zeros((), jnp.int64)
        leaf_tris = jnp.zeros((), jnp.int64)
        overflow = jnp.zeros((), jnp.int32)

        def level(carry, _):
            ray, node, alive, visits, leaf_tris, overflow = carry
            nrow = nodes[node]  # (cap, 8) row gather
            ob = o_arr[ray]     # (cap, 3) row gather
            ib = inv_arr[ray]
            tc = tcap_arr[ray]
            t0 = (nrow[:, 0:3] - ob) * ib
            t1 = (nrow[:, 3:6] - ob) * ib
            tn = jnp.minimum(t0, t1).max(1)
            tf = jnp.maximum(t0, t1).min(1)
            hit = alive & (tn <= tf) & (tf >= 1e-4) & (tn <= tc)
            visits = visits + hit.sum()
            leafy = nrow[:, 7] >= 0
            hit_leaf = hit & leafy
            leaf_tris = leaf_tris + jnp.where(
                hit_leaf, nrow[:, 7], 0.0).sum().astype(jnp.int64)
            expand = hit & ~leafy
            # children: left = node+1, right = packed field 6
            l_node = node + 1
            r_node = nrow[:, 6].astype(jnp.int32)
            # bin the 2*cap candidate pairs: dead-last, node-major order
            c_ray = jnp.concatenate([ray, ray])
            c_node = jnp.concatenate([l_node, r_node])
            c_alive = jnp.concatenate([expand, expand])
            key = jnp.where(c_alive, c_node, jnp.int32(2**30))
            order = jnp.argsort(key)  # the per-level global sort
            c_ray = c_ray[order][:cap]
            c_node = c_node[order][:cap]
            c_alive = c_alive[order][:cap]
            overflow = overflow + (c_alive[-1]).astype(jnp.int32)
            return (c_ray, jnp.where(c_alive, c_node, 0), c_alive,
                    visits, leaf_tris, overflow), alive.sum()

        carry, per_level = jax.lax.scan(
            level, (ray, node, alive, visits, leaf_tris, overflow),
            None, length=MAX_LEVELS)
        _, _, alive, visits, leaf_tris, overflow = carry
        return visits, leaf_tris, overflow, alive.sum(), per_level

    fn = jax.jit(bfs)
    rng2 = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))

    def once():
        eps = jnp.float32(float(rng2.random()) * 1e-5)
        t0 = time.perf_counter()
        out = fn(O + eps, INV, TCAP)
        res = [np.asarray(jax.device_get(x)) for x in out[:4]]
        return time.perf_counter() - t0, res

    once()
    best, res = min((once() for _ in range(3)), key=lambda x: x[0])
    visits, leaf_tris, overflow, still = res
    t_classic_n = t_classic * n / n_all
    print(f"node-major BFS skeleton ({n} rays, cap {CAP_PER_RAY}x, "
          f"{MAX_LEVELS} levels): {best*1e3:.1f} ms")
    print(f"  visits/ray {visits/n:.1f} (per-ray exact), leaf tri-tests "
          f"excluded from timing: {leaf_tris/n:.1f}/ray")
    print(f"  frontier overflowed: {overflow} levels; unfinished pairs "
          f"{still}")
    print(f"classic sorted packet trace, scaled to {n} rays: "
          f"{t_classic_n*1e3:.1f} ms")
    ratio = best / t_classic_n
    print(f"VERDICT: node-major skeleton is {ratio:.2f}x the classic "
          f"trace{' — family CLOSED' if ratio > 0.85 else ' — investigate'}"
          f" (skeleton excludes all leaf work; classic includes it)")


if __name__ == "__main__":
    main()
