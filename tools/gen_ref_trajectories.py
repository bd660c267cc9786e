"""Run the reference ALTRO end-to-end (as an oracle) for each system and save
the converged trajectories as goldens.  Runs from a scratch cwd (the reference
tree is read-only; its plotting code writes ./result_images relatively).

Usage: python tools/gen_ref_trajectories.py [piano_mover|quadrotor|coneThroughWall]
"""

import os
import sys
import time

import numpy as np

REF = "/root/reference"
OUT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "tests", "goldens"))
RUN = "/tmp/refrun"

os.makedirs(RUN, exist_ok=True)
link = os.path.join(RUN, "systems")
if not os.path.exists(link):
    os.symlink(os.path.join(REF, "systems"), link)
os.chdir(RUN)
sys.path.insert(0, REF)

import matplotlib  # noqa: E402

matplotlib.use("Agg")

from ALTRO import ALTRO  # noqa: E402
from systems.piano_mover import initialize_piano_mover  # noqa: E402
from systems.cluttered_hallway_quadrotor import initialize_quadrotor  # noqa: E402
from systems.cone_through_wall import initialize_coneThroughWall  # noqa: E402


def main(which):
    init = {
        "piano_mover": initialize_piano_mover,
        "quadrotor": initialize_quadrotor,
        "coneThroughWall": initialize_coneThroughWall,
    }[which]
    params, X, U = init()
    t0 = time.time()
    Xn, Un = ALTRO(params, X, U)
    wall = time.time() - t0
    n_iters = len(params["U_hist"]) - 2  # init + initial rollout entries
    np.savez(
        os.path.join(OUT, f"ref_{which}.npz"),
        X=np.asarray(Xn), U=np.asarray(Un), wall=wall, iters=n_iters)
    print(f"{which}: {wall:.1f}s, hist entries {len(params['U_hist'])}")


if __name__ == "__main__":
    main(sys.argv[1])
