"""Layout study: 1-D slab vs 1-D row-cyclic vs masked 2-D block-cyclic
distributed Cholesky (dev tool; VERDICT r3 item 3).

SURVEY.md §2.3 committed a 2-D ('row','col') block-cyclic layout;
`parallel/cholesky.py` re-scoped to 1-D row-cyclic with a written argument:
a 2-D layout's theoretical ~N³/(6P) per-device MACs require each device to
touch ONLY its lower-triangle tiles (i ≥ j), but that tile set depends on
the (row-rank, col-rank) pair — it cannot ride one static-shape SPMD
program, and the static-shape alternative (update the full active-row ×
active-col rectangle, mask the upper half away) computes
Σ_k ((N−c)/Pr)·B·((N−c)/Pc) = **N³/(3P)** — identical to 1-D row-cyclic.

This script turns that argument into numbers: it implements the masked 2-D
prototype (the best static-shape 2-D program) and harvests **compiled
per-device FLOPs** from XLA's cost analysis for all three variants at
P ∈ {8, 16, 32} virtual devices, plus analytic collective-traffic counts.
Results: docs/parallel.md "Layout decision" table.

Usage:
  python scripts/layout_study.py --p 8 --n 2048 --block 128   # one P
  python scripts/layout_study.py --check                      # correctness
(The virtual device count must be set before jax initialises, so run one
process per P.)
"""

import argparse
import functools
import json
import os
import sys

_ap = argparse.ArgumentParser()
_ap.add_argument("--p", type=int, default=8)
_ap.add_argument("--n", type=int, default=2048)
_ap.add_argument("--block", type=int, default=128)
_ap.add_argument("--check", action="store_true",
                 help="numerical check of the 2-D prototype vs dense")
args = _ap.parse_args()

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={args.p}"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax, shard_map  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

from stheno_tpu.ops import chol as _chol  # noqa: E402
from stheno_tpu.ops.blocked_cholesky import _mm  # noqa: E402


def _grid(p):
    """Near-square (Pr, Pc) factorisation of p."""
    pr = int(np.sqrt(p))
    while p % pr != 0:
        pr -= 1
    return max(pr, 1), p // max(pr, 1)


# ---------------------------------------------------------------------------
# Masked 2-D block-cyclic prototype (study-only)
# ---------------------------------------------------------------------------
# Tile (I, J) (B×B, I,J < nb) lives on rank (I mod Pr, J mod Pc); local
# storage is the (N/Pr, N/Pc) cyclic slab.  Per panel k the active local
# rows/cols are STATIC slot ranges (identical on every rank up to one
# masked boundary block) — the best a single SPMD program can do; the
# j ≤ i triangle restriction is necessarily masked, not skipped.


def _chol_2d_loop(K_loc, *, block_size, n_total, pr, pc):
    rrank = lax.axis_index("row")
    crank = lax.axis_index("col")
    B = block_size
    nb = n_total // B
    mr = nb // pr  # local row slots
    mc = nb // pc  # local col slots
    dt = K_loc.dtype

    rows_within = jnp.arange(mr * B) % B
    g_rows = (rrank + (jnp.arange(mr * B) // B) * pr) * B + rows_within
    g_cols = (crank + (jnp.arange(mc * B) // B) * pc) * B + jnp.arange(mc * B) % B

    for k in range(nb):
        c = k * B
        r_own, c_own = k % pr, k % pc  # static
        sr, sc = k // pr, k // pc  # static local slots of the diagonal tile

        # diagonal tile: psum-broadcast over both axes
        contrib = K_loc[sr * B : (sr + 1) * B, sc * B : (sc + 1) * B]
        mine = (rrank == r_own) & (crank == c_own)
        diag = lax.psum(
            lax.psum(jnp.where(mine, contrib, jnp.zeros((B, B), dt)), "row"),
            "col",
        )
        L_kk = _chol.cholesky_psd(diag)
        K_loc = K_loc.at[sr * B : (sr + 1) * B, sc * B : (sc + 1) * B].set(
            jnp.where(mine, L_kk, contrib)
        )

        # panel column (tiles (i, k), i > k): on col-owner ranks only.
        # active local row slots: static start, ≤ 1 masked boundary block
        tr = max(0, -((-(k + 2 - pr)) // pr))  # ceil((k+2-pr)/pr)
        if tr >= mr:
            continue
        rs = tr * B
        m_act = mr * B - rs
        below = (g_rows[rs:] >= c + B)[:, None]

        A_act = K_loc[rs:, sc * B : (sc + 1) * B]  # (m_act, B)
        P_act = _chol.solve_lower(L_kk, A_act.T).T
        new_act = jnp.where((crank == c_own) & below, P_act, jnp.zeros_like(P_act))
        K_loc = K_loc.at[rs:, sc * B : (sc + 1) * B].set(
            jnp.where((crank == c_own) & below, new_act, A_act)
        )

        if c + B >= n_total:
            continue

        # row factor for MY local rows: broadcast the owner column's panel
        # along 'col' (each rank then holds its own rows' panel entries)
        Lrow = lax.psum(new_act, "col")  # (m_act, B)

        # column factor for MY local cols: needs panel rows j for my col
        # ids — gather the panel over 'row' (full trailing height), then a
        # static permutation picks this rank's column ids
        gathered = lax.all_gather(Lrow, "row")  # (pr, m_act, B)
        flat = gathered.reshape(pr * m_act, B)
        # global row gr (≥ (tr·pr+rrank… ) ) lives at flat index:
        #   owner r = (gr//B) mod pr, slot t = gr//B//pr, offset gr%B
        tc = max(0, -((-(k + 2 - pc)) // pc))  # first active local col slot
        if tc >= mc:
            continue
        cs = tc * B
        mc_act = mc * B - cs
        gcol = np.arange(cs, mc * B)  # local col positions (static)
        # need global col ids → but they depend on crank (traced).  Use the
        # traced g_cols with jnp.take: index = ((g//B)%pr)*m_act + ((g//B)//pr - tr)*B + g%B
        gc = g_cols[cs:]
        gblk = gc // B
        idx = (gblk % pr) * m_act + (gblk // pr - tr) * B + gc % B
        ok = gc >= c + B  # boundary mask (≤ one block)
        Lcol = jnp.take(flat, jnp.clip(idx, 0, pr * m_act - 1), axis=0)
        Lcol = jnp.where(ok[:, None], Lcol, 0.0)  # (mc_act, B)

        # trailing update: FULL active-rows × active-cols rectangle — the
        # j ≤ i triangle cannot be expressed with static shapes, so the
        # upper half is computed and (implicitly) wasted.  This is where
        # the 2-D layout's N³/(6P) dream dies in SPMD.
        update = _mm(jnp.where(below, Lrow, 0.0), Lcol.T)  # (m_act, mc_act)
        K_loc = K_loc.at[rs:, cs:].add(-update)

    # zero everything above the global diagonal
    return jnp.where(g_cols[None, :] <= g_rows[:, None], K_loc, 0.0)


def _to_2d_cyclic(K, mesh, B, pr, pc):
    """Host-side relayout of a replicated K into the 2-D cyclic local slabs
    (study-only; the library relayout question is orthogonal here)."""
    n = K.shape[0]
    nb = n // B
    perm_r = np.arange(nb).reshape(-1, pr).T.reshape(-1)  # cyclic row order
    perm_c = np.arange(nb).reshape(-1, pc).T.reshape(-1)
    rows = (perm_r[:, None] * B + np.arange(B)[None, :]).reshape(-1)
    cols = (perm_c[:, None] * B + np.arange(B)[None, :]).reshape(-1)
    Kp = np.asarray(K)[np.ix_(rows, cols)]
    return jnp.asarray(Kp), rows, cols


def chol_2d(mesh, K_perm, block_size, pr, pc, n):
    fn = shard_map(
        functools.partial(
            _chol_2d_loop, block_size=block_size, n_total=n, pr=pr, pc=pc
        ),
        mesh=mesh,
        in_specs=P("row", "col"),
        out_specs=P("row", "col"),
    )
    return fn(K_perm)


def main():
    p = args.p
    n = args.n
    B = args.block
    pr, pc = _grid(p)
    devs = np.asarray(jax.devices()[:p])

    from stheno_tpu.parallel.cholesky import (
        distributed_cholesky,
        distributed_cholesky_cyclic,
    )

    mesh1 = Mesh(devs, ("rows",))
    mesh2 = Mesh(devs.reshape(pr, pc), ("row", "col"))

    rng = np.random.default_rng(0)
    A = rng.normal(size=(n, n))
    K = jnp.asarray(A @ A.T + n * np.eye(n), jnp.float32)

    if args.check:
        Kp, rows, cols = _to_2d_cyclic(K, mesh2, B, pr, pc)
        with mesh2:
            Lp = chol_2d(mesh2, Kp, B, pr, pc, n)
        L = np.zeros((n, n), np.float32)
        L[np.ix_(rows, cols)] = np.asarray(Lp)
        L_ref = np.linalg.cholesky(np.asarray(K, np.float64))
        err = np.abs(L - L_ref).max() / np.abs(L_ref).max()
        print(f"2-D prototype vs dense: rel err {err:.2e}", file=sys.stderr)
        assert err < 1e-4
        print(json.dumps({"check": "ok", "rel_err": float(err)}))
        return

    def flops_of(fn, *xs):
        c = jax.jit(fn).lower(*xs).compile()
        fl = c.cost_analysis()["flops"]
        return float(fl)

    out = {"p": p, "grid": [pr, pc], "n": n, "block": B}
    with mesh1:
        out["slab_flops"] = flops_of(
            lambda K: distributed_cholesky(mesh1, K, block_size=B), K
        )
        out["cyclic_flops"] = flops_of(
            lambda K: distributed_cholesky_cyclic(mesh1, K, block_size=B), K
        )
    Kp, _, _ = _to_2d_cyclic(K, mesh2, B, pr, pc)
    with mesh2:
        out["masked2d_flops"] = flops_of(
            lambda Kp: chol_2d(mesh2, Kp, B, pr, pc, n), Kp
        )
    # analytic MAC floors (per device) and collective word counts
    out["floor_slab"] = n**3 / (2 * p)
    out["floor_rowcyclic"] = n**3 / (3 * p)
    out["floor_2d_masked"] = n**3 / (3 * p)
    out["floor_2d_triangle_unreachable"] = n**3 / (6 * p)
    # per-device words RECEIVED by collectives (leading order):
    #   slab / row-cyclic: panel all_gather: Σ_k (N−c)·B ≈ N²/2
    #   2-D: panel bcast over 'col' (N/Pr · B · nb = N²/Pr) + row gather
    #        over 'row' (Σ (N−c)·B ≈ N²/2 — the column factor still needs
    #        the full trailing panel height on every rank)
    out["comm_words_slab"] = n * n / 2
    out["comm_words_cyclic"] = n * n / 2
    out["comm_words_2d"] = n * n / 2 + n * n / pr
    print(json.dumps(out))


if __name__ == "__main__":
    main()
