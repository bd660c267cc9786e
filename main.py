"""CLI driver — usage parity with the reference (``main.py:24-66``):

    python main.py --system {piano_mover,quadrotor,coneThroughWall}
                   [--batch N] [--f32] [--no-viz]

Runs the ALTRO solve (verbose per-iteration table), then renders the scene
visualisations and diagnostic plots under result_images/<system>/.
"""

import argparse
import time


def main():
    parser = argparse.ArgumentParser(description="TPU-native DCOL trajectory optimization.")
    parser.add_argument("--system", required=True,
                        choices=["piano_mover", "quadrotor", "coneThroughWall"])
    parser.add_argument("--batch", type=int, default=0,
                        help="solve a batch of perturbed scenarios instead of one")
    parser.add_argument("--f32", action="store_true",
                        help="force float32 (default on TPU)")
    parser.add_argument("--f64", action="store_true",
                        help="force float64 (default on CPU; requires x64)")
    parser.add_argument("--no-viz", action="store_true")
    parser.add_argument("--cpu", action="store_true",
                        help="run on CPU (this container force-sets the axon "
                             "TPU platform; the env var alone is not enough)")
    parser.add_argument("--verbose", action="store_true",
                        help="print the iteration table live (one device "
                             "round-trip per iteration) instead of post-hoc")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dcol_tpu.solver import altro
    from dcol_tpu.systems import cone_through_wall, piano_mover, quadrotor

    mod = {
        "piano_mover": piano_mover,
        "quadrotor": quadrotor,
        "coneThroughWall": cone_through_wall,
    }[args.system]
    on_cpu = jax.devices()[0].platform == "cpu"
    if args.f64 or (on_cpu and not args.f32):
        jax.config.update("jax_enable_x64", True)
        dtype = jnp.float64
    else:
        jax.config.update("jax_enable_x64", False)  # env may force it on
        dtype = jnp.float32
    sys_, params, X0, U0, cfg = mod.make_problem(dtype=dtype)

    if args.batch:
        from dcol_tpu.parallel.batch import perturb_scenarios, solve_batch
        from dcol_tpu.parallel.mesh import summarize

        params_b, X0_b, U0_b = perturb_scenarios(
            params, X0, U0, n=args.batch, x0_sigma=0.02)
        t0 = time.time()
        st = solve_batch(sys_, params_b, cfg, X0_b, U0_b)
        st.X.block_until_ready()
        print(f"batch of {args.batch} solved in {time.time() - t0:.1f}s:"
              f" {summarize(st)}")
        return

    print(f"Starting ALTRO optimization ({args.system})...")
    t0 = time.time()
    history = [] if not args.no_viz else None
    con_hist = [] if not args.no_viz else None
    if args.verbose or history is not None:
        # python-loop solve: live table and/or host-side X/U history capture
        # for the per-iteration trajectory plots (reference ALTRO.py:424-425)
        # plus per-constraint violation maxima for the per-curve plots
        import numpy as np

        cb = None
        if history is not None:
            def cb(itr, st):
                history.append((np.asarray(st.X), np.asarray(st.U)))
                con_hist.append((np.asarray(st.hx).max(axis=0),
                                 np.asarray(st.hu).max(axis=0)))
        st = altro.solve_verbose(sys_, params, cfg, X0, U0, callback=cb,
                                 print_table=args.verbose)
        if not args.verbose:
            from dcol_tpu.utils import metrics

            print(metrics.iteration_table(st))
    else:
        st = altro.solve(sys_, params, cfg, X0, U0)
        st.X.block_until_ready()
        from dcol_tpu.utils import metrics

        print(metrics.iteration_table(st))
    print(f"ALTRO optimization complete in {time.time() - t0:.1f}s "
          f"(converged={bool(st.converged)}, iters={int(st.iter)}).")

    if not args.no_viz:
        from dcol_tpu.utils import plots, viz

        plots.plot_all(args.system, sys_, st)
        plots.plot_history(args.system, history, sys_.dt)
        if con_hist:
            plots.plot_per_constraint_violations(
                args.system, [hx for hx, _ in con_hist],
                [hu for _, hu in con_hist])
        viz.visualize_scene(args.system, sys_, params, st)
        print(f"Wrote plots + scene renders to result_images/{args.system}/")


if __name__ == "__main__":
    main()
