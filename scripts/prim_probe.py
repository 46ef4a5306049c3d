"""Time the XLA primitives of the round-5 pair-grouped sweep on real TPU.

The per-ray pair-expansion traversal (NOTES facts #43/#46) needs a grouping
pipeline: per-ray demand matrix [N, nsb] -> per-ray compacted block list
[N, K] -> block-grouped pair positions -> ONE ~N*K-index scatter -> pair
arrays, results combined back via [N, K] gathers + row-min. Fact #46 showed
the 106M-index scatters of the uncompacted formulation are the poison
(~0.43M indices/ms); this probe times each compacted-path candidate so the
implementation picks the cheap ones.

Run ON TPU (axon tunnel). One JSON line per item, steady-state ms.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 524288
NSB = 202
K = 16
PCAP = N * 8  # pair-slot capacity


def bench(name, fn, *args, iters=10):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    # hard sync via host transfer of one element (axon tunnel, NOTES timing rule)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(json.dumps({"item": name, "ms": round(dt, 2)}), flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # synthetic near-realistic demand: ~10 true bits per row
    demand = jax.random.uniform(k1, (N, NSB)) < (10.0 / NSB)
    d2 = jax.random.uniform(k2, (N, NSB), jnp.float32)
    demand = jax.device_put(demand)
    d2 = jax.device_put(d2)
    o = jax.random.normal(k3, (3, N), jnp.float32) * 10
    d = jax.random.normal(k4, (3, N), jnp.float32)
    sb = jnp.concatenate(
        [jax.random.normal(k1, (3, NSB)) * 20 - 5, jax.random.normal(k2, (3, NSB)) * 20 + 5]
    )

    @jax.jit
    def demand_slab(o, d, sb):
        inv = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
        tn = jnp.zeros((N, 1))
        tf = jnp.full((N, 1), 1e30)
        for c in range(3):
            lo = sb[c][None, :]
            hi = sb[3 + c][None, :]
            t0 = (lo - o[c][:, None]) * inv[c][:, None]
            t1 = (hi - o[c][:, None]) * inv[c][:, None]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        return tn <= tf

    bench("demand_slab_[N,202]", demand_slab, o, d, sb)

    bench("cumsum_ax0_i32", jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32), axis=0)), demand)
    bench("cumsum_ax1_i32", jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32), axis=1)), demand)

    @jax.jit
    def topk16(dm, dd):
        key = jnp.where(dm, dd, jnp.inf)
        v, idx = jax.lax.top_k(-key, K)
        return idx

    idx16 = bench("topk16_[N,202]", topk16, demand, d2)

    @jax.jit
    def topk32(dm, dd):
        key = jnp.where(dm, dd, jnp.inf)
        v, idx = jax.lax.top_k(-key, 32)
        return idx

    bench("topk32_[N,202]", topk32, demand, d2)

    @jax.jit
    def argmax_loop(dm):
        # gather-free row compaction: k-th demanded block per row
        rc = jnp.cumsum(dm.astype(jnp.int32), axis=1) - dm.astype(jnp.int32)
        outs = []
        for k in range(K):
            m = dm & (rc == k)
            outs.append(jnp.argmax(m, axis=1).astype(jnp.int32))
        return jnp.stack(outs, axis=1)

    bench("argmaxloop16", argmax_loop, demand)

    @jax.jit
    def gather_cols(mat, idx):
        return jnp.take_along_axis(mat, idx, axis=1)

    bench("take_along_[N,16]", gather_cols, d2, idx16)

    pos = jax.random.randint(k3, (N, K), 0, PCAP, jnp.int32)
    vals = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, K))

    @jax.jit
    def scatter_pairs(pos, vals):
        return jnp.zeros(PCAP, jnp.int32).at[pos.reshape(-1)].set(
            vals.reshape(-1), mode="drop"
        )

    pair_ray = bench("scatter_8.4M->4.2M", scatter_pairs, pos, vals)

    @jax.jit
    def gather_back(arr, pos):
        return arr[pos.reshape(-1)].reshape(N, K)

    bench("gather_4.2M->[N,16]", gather_back, pair_ray, pos)

    @jax.jit
    def row_gather_state(pair_ray, o):
        # pair state gather: 8 f32 rows
        st = jnp.concatenate([o, o, o[:2]], axis=0)  # [8, N]
        return st[:, pair_ray]

    bench("pair_state_rowgather_[8,4.2M]", row_gather_state, pair_ray, o)

    @jax.jit
    def full_group(o, d, sb, d2):
        dm = demand_slab(o, d, sb)
        counts = dm.sum(axis=0)  # [nsb]
        seg = ((counts + 1023) // 1024) * 1024
        offs = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(seg)[:-1].astype(jnp.int32)])
        rank = jnp.cumsum(dm.astype(jnp.int32), axis=0) - dm.astype(jnp.int32)
        key = jnp.where(dm, d2, jnp.inf)
        _, idx = jax.lax.top_k(-key, K)
        idx = idx.astype(jnp.int32)
        valid = jnp.take_along_axis(dm, idx, axis=1)
        rk = jnp.take_along_axis(rank, idx, axis=1)
        p = offs[idx] + rk
        p = jnp.where(valid, p, PCAP)
        ray_ids = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, K))
        pair_ray = jnp.full(PCAP, -1, jnp.int32).at[p.reshape(-1)].set(
            ray_ids.reshape(-1), mode="drop"
        )
        return pair_ray, p, counts.sum()

    bench("FULL_grouping_pipeline", full_group, o, d, sb, d2)

    @jax.jit
    def combine(tp, p):
        tnk = jnp.where(p < PCAP, tp[jnp.minimum(p, PCAP - 1).reshape(-1)].reshape(N, K), 1e30)
        tb = jnp.min(tnk, axis=1)
        kb = jnp.argmin(tnk, axis=1)
        return tb, kb

    tp = jax.random.uniform(k4, (PCAP,), jnp.float32)
    bench("combine_gather_min", combine, tp, pos)

    print(json.dumps({"item": "done", "device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
