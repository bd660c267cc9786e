"""Roofline / MFU accounting for the hot kernels (VERDICT r4 item #2).

Three parts:

1. ``analyze`` (CPU, no TPU needed): trace the shared PDIP kernel math
   (:func:`dcol_tpu.ops.pdip_pallas._make_math`) one iteration per obstacle
   group and count the VPU vector instructions it issues per 1024-lane batch
   tile (each (8, 128) f32 op = exactly one vector register instruction in
   the kernel's vreg layout).  Also jaxpr-level FLOP counts for the other
   hot components (dynamics Jacobians, Riccati scan, rollout) on the real
   solver code.

2. ``peak`` (TPU): measure the chip's attainable vector-instruction issue
   rate with a dense Pallas FMA kernel using the same while_loop structure
   as the PDIP kernel (8 independent accumulator chains so throughput, not
   latency, is measured).  This anchors "speed of light" empirically
   instead of guessing unpublished clock specs.

3. ``kernel`` (TPU): time the real grouped PDIP kernels cold (the bench.py
   shape) so utilization = counted instructions / (wall x peak rate).

The published table lives in docs/PROFILE.md ("Roofline").
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

# ops that cost multiple VPU cycles (div / sqrt family); everything
# elementwise else is ~1 cycle per vreg
_SLOW = {"div", "sqrt", "rsqrt", "pow", "integer_pow"}
# primitives that are free at run time (metadata / layout only here)
_FREE = {"reshape", "broadcast_in_dim", "squeeze", "convert_element_type",
         "transpose", "slice", "concatenate", "copy", "stop_gradient"}


def _walk(jaxpr, tally):
    for eqn in jaxpr.eqns:
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                inner = sub.jaxpr if hasattr(sub.jaxpr, "eqns") else sub
                _walk(inner if hasattr(inner, "eqns") else inner.jaxpr, tally)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        _walk(s.jaxpr, tally)
        name = eqn.primitive.name
        if name in ("pjit", "jit", "closed_call", "custom_jvp_call",
                    "custom_vjp_call", "remat", "checkpoint", "scan",
                    "while", "cond"):
            continue  # handled via params above (counting the call
            # primitive's outputs too would double-count its body)
        outs = [v.aval for v in eqn.outvars if hasattr(v.aval, "shape")]
        if not outs:
            continue
        n = sum(int(np.prod(a.shape)) if a.shape else 1 for a in outs)
        tally[name] += n


def jaxpr_flops(fn, *args):
    """Crude FLOP/element tally from a traced jaxpr: elementwise = out size,
    dot_general = 2mnk, reductions = input size."""
    jx = jax.make_jaxpr(fn)(*args)
    flops = 0.0

    def walk(jaxpr, mult=1.0):
        nonlocal flops
        for eqn in jaxpr.eqns:
            name = eqn.primitive.name
            # scan bodies execute `length` times; while trip counts are
            # unknowable statically (counted once — an undercount)
            sub_mult = mult * eqn.params.get("length", 1) \
                if name == "scan" else mult
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    j = sub.jaxpr if hasattr(sub.jaxpr, "eqns") else None
                    walk(j if j is not None else sub.jaxpr, sub_mult)
                elif isinstance(sub, (list, tuple)):
                    for s in sub:
                        if hasattr(s, "jaxpr"):
                            walk(s.jaxpr, sub_mult)
            if name in ("pjit", "closed_call", "custom_jvp_call",
                        "custom_vjp_call", "cond", "scan", "while"):
                continue
            if name == "dot_general":
                lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
                dims = eqn.params["dimension_numbers"]
                (lc, rc), (lb, rb) = dims
                m = np.prod([d for i, d in enumerate(lhs.shape)
                             if i not in lc and i not in lb], initial=1)
                k = np.prod([lhs.shape[i] for i in lc], initial=1)
                n = np.prod([d for i, d in enumerate(rhs.shape)
                             if i not in rc and i not in rb], initial=1)
                b = np.prod([lhs.shape[i] for i in lb], initial=1)
                flops += mult * 2.0 * b * m * n * k
            elif name.startswith("reduce_"):
                flops += mult * float(
                    np.prod(eqn.invars[0].aval.shape, initial=1))
            elif name in _FREE:
                continue
            else:
                outs = [v.aval for v in eqn.outvars
                        if hasattr(v.aval, "shape")]
                flops += mult * sum(
                    float(np.prod(a.shape)) if a.shape else 1.0
                    for a in outs)
    walk(jx.jaxpr)
    return flops


def count_kernel_iteration(lay, nv, sl=8):
    """Vector instructions one PDIP Mehrotra iteration issues per (sl, 128)
    batch tile, from the traced jaxpr of the shared kernel math."""
    from dcol_tpu.ops.pdip_pallas import _layout_blocks, _make_math

    _, _, body, _, blocks = _make_math(lay, nv, tol=1e-6, jitter=0.0)
    mk = lambda: jnp.zeros((sl, 128), jnp.float32)
    Gc = [tuple([mk() for _ in range(r)] for _, o, r in blocks)
          for _ in range(nv)]
    h = tuple([mk() for _ in range(r)] for _, o, r in blocks)
    c = [mk() for _ in range(nv)]
    x = [mk() for _ in range(nv)]
    s = tuple([mk() + 1.0 for _ in range(r)] for _, o, r in blocks)
    z = tuple([mk() + 1.0 for _ in range(r)] for _, o, r in blocks)
    carry = (x, s, z, mk(), mk())
    jx = jax.make_jaxpr(lambda G_, h_, c_, cr: body(G_, h_, c_, cr))(
        Gc, h, c, carry)
    tally = defaultdict(int)
    _walk(jx.jaxpr, tally)
    # normalize to vreg instructions: every counted element belongs to an
    # (sl, 128) array -> /= sl*128
    per = {k: v / (sl * 128) for k, v in tally.items() if k not in _FREE}
    total = sum(per.values())
    slow = sum(v for k, v in per.items() if k in _SLOW)
    return total, slow, dict(sorted(per.items(), key=lambda kv: -kv[1]))


def analyze():
    from dcol_tpu.systems import cone_through_wall, piano_mover, quadrotor

    print("== PDIP kernel: vector instructions per Mehrotra iteration per "
          "1024-lane tile ==")
    rows = []
    for mod, name in ((quadrotor, "quadrotor"), (piano_mover, "piano"),
                      (cone_through_wall, "cone")):
        sys_, params, X0, U0, cfg = mod.make_problem(dtype=jnp.float32)
        for lay_pair, idx in sys_.scene.groups:
            from dcol_tpu.ops.cones import ConeLayout
            lay = ConeLayout(lay_pair.n_ort, lay_pair.s1, lay_pair.s2)
            nv = lay_pair.nv
            total, slow, by = count_kernel_iteration(lay, nv)
            rows.append((name, idx, lay, nv, total, slow))
            print(f"  {name:10s} obs {str(idx):14s} nv={nv} "
                  f"n_ort={lay.n_ort} s1={lay.s1} s2={lay.s2}: "
                  f"{total:7.0f} instr/iter ({slow:4.0f} div/sqrt)")

    # quadrotor batch-64 constraint batch: instructions for one cold solve
    sys_, params, X0, U0, cfg = quadrotor.make_problem(dtype=jnp.float32)
    B, N = 64, sys_.N
    tot = 0.0
    for (lay_pair, idx), (nm, _i, lay, nv, total, slow) in zip(
            sys_.scene.groups, rows):
        n_pairs = B * N * len(idx)
        tiles = -(-n_pairs // 1024)
        tot += tiles * total
    print(f"\nquadrotor batch-64 constraint batch (70,400 pair problems): "
          f"{tot / 1e3:.0f}k vector instructions per PDIP iteration "
          f"(all groups)")

    # FLOP counts for the other hot components (per batched call, batch 64)
    from dcol_tpu.parallel.batch import perturb_scenarios
    from dcol_tpu.solver import altro
    pb, xb, ub = perturb_scenarios(params, X0, U0, n=2, seed=0,
                                   x0_sigma=0.02)
    p1 = jax.tree_util.tree_map(lambda a: a[0], pb)
    X = jnp.zeros((N, sys_.nx), jnp.float32)
    U = jnp.zeros((N - 1, sys_.nu), jnp.float32)
    ks = jnp.arange(N - 1)

    f_jac = jaxpr_flops(
        lambda X_, U_: jax.vmap(lambda x, u, kk: sys_.dynamics_jacobians(
            p1, x, u, kk))(X_[:-1], U_, ks), X, U)
    f_roll = jaxpr_flops(
        lambda x0, U_: altro.initial_rollout(sys_, p1, x0, U_), X[0], U)
    print(f"\nper-member FLOPs (jaxpr tally, N={N}):")
    print(f"  dynamics_jacobians (jacfwd RK4, {N-1} knots): "
          f"{f_jac/1e6:.2f} MFLOP")
    print(f"  rollout ({N-1} RK4 steps):                    "
          f"{f_roll/1e6:.2f} MFLOP")
    print(f"  batch 64: jac {64*f_jac/1e6:.0f} MFLOP/call, "
          f"rollout {64*f_roll/1e6:.0f} MFLOP/call")


def peak(sl=8, unroll=64, inner=200, calls=40, tiles=64):
    """Measure attainable VPU vector-instruction rate: `unroll` independent
    mul-add pairs per loop body over 8 accumulator chains, same while_loop
    shape as the PDIP kernel.  Prints instructions/s."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        a = [x_ref[i] for i in range(8)]
        b = x_ref[8]
        c = x_ref[9]

        def cond(carry):
            return carry[0] < inner

        def body(carry):
            i, *acc = carry
            acc = list(acc)
            for j in range(unroll // 8):
                for t in range(8):
                    acc[t] = acc[t] * b + c
            return (i + 1, *acc)

        out = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), *a))
        o_ref[0] = sum(out[1:])

    x = jnp.full((10, tiles * sl, 128), 0.9999, jnp.float32)
    bspec = lambda r: pl.BlockSpec((r, sl, 128), lambda b: (0, b, 0),
                                   memory_space=pltpu.VMEM)
    run = jax.jit(lambda x: pl.pallas_call(
        kernel, grid=(tiles,), in_specs=[bspec(10)], out_specs=bspec(1),
        out_shape=jax.ShapeDtypeStruct((1, tiles * sl, 128), jnp.float32))(x))

    out = run(x)
    jax.device_get(out[0, 0, 0])
    t0 = time.time()
    for _ in range(calls):
        out = run(x)
    jax.device_get(out[0, 0, 0])
    wall = time.time() - t0
    # each mul-add pair = 2 vector instructions (mul, add) unless fused; we
    # report INSTRUCTIONS assuming fma fusion = 1 (lower bound) and 2 ops
    n_body_ops = unroll  # fma-fused count
    total = calls * tiles * inner * n_body_ops
    print(f"VPU peak probe: {calls} calls x {tiles} tiles x {inner} loop x "
          f"{unroll} fma = {total/1e9:.2f} G vreg-FMAs in {wall*1e3:.1f} ms")
    print(f"  -> {total / wall / 1e9:.1f} G vreg-FMA/s "
          f"= {total * 1024 * 2 / wall / 1e12:.2f} f32 TFLOP/s attainable")


def kernel_cold(reps=10):
    """Time the real grouped PDIP kernels cold at the bench.py shape (the
    bench does this too; standalone here for utilization accounting)."""
    from dcol_tpu.parallel.batch import perturb_scenarios
    from dcol_tpu.solver import altro
    from dcol_tpu.systems import quadrotor

    sys_, params, X0, U0, cfg = quadrotor.make_problem(dtype=jnp.float32)
    pb, xb, ub = perturb_scenarios(params, X0, U0, n=64, seed=0,
                                   x0_sigma=0.02)

    @jax.jit
    def init(pb, xb, ub):
        return jax.vmap(lambda p, x0, u0: altro.make_initial_state(
            sys_, p, cfg, x0, u0))(pb, xb, ub)

    st = init(pb, xb, ub)
    jax.block_until_ready(st.X)

    @jax.jit
    def cold(st, pb):
        def chain(i, acc):
            hx, w = jax.vmap(lambda p, s: sys_.constraints_x_traj(
                p, s.X, warm=None))(pb, st)
            return acc + hx.sum()
        return jax.lax.fori_loop(0, reps, chain, jnp.zeros((), jnp.float32))

    out = cold(st, pb)
    jax.device_get(out)
    t0 = time.time()
    out = cold(st, pb)
    jax.device_get(out)
    wall = (time.time() - t0) / reps
    print(f"cold constraint batch (70,400 pair problems): {wall*1e3:.2f} ms")


if __name__ == "__main__":
    cmd = _sys.argv[1] if len(_sys.argv) > 1 else "analyze"
    if cmd == "analyze":
        jax.config.update("jax_platforms", "cpu")
        analyze()
    elif cmd == "peak":
        peak()
    elif cmd == "kernel":
        kernel_cold()
    else:
        _sys.exit("usage: roofline.py [analyze|peak|kernel]")
