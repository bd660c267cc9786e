"""Extract pinned data fixtures from the reference into plain .npz files:
the Julia-seed-2 initial control sequences (hardcoded arrays in
systems/piano_mover.py:228 and systems/cluttered_hallway_quadrotor.py:379),
the seeded numpy initial controls of cone_through_wall (np.random.seed(2),
systems/cone_through_wall.py:320-323), and the polytope H-reps from
systems/polytopes.jld2.  Data only — no code is copied."""

import os
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "dcol_tpu", "systems", "data")
sys.path.insert(0, REF)
os.chdir(REF)  # quadrotor initializer opens systems/polytopes.jld2 relatively

from systems.piano_mover import initialize_piano_mover  # noqa: E402
from systems.cluttered_hallway_quadrotor import initialize_quadrotor  # noqa: E402
from systems.cone_through_wall import initialize_coneThroughWall  # noqa: E402
import h5py  # noqa: E402


def main():
    os.makedirs(OUT, exist_ok=True)
    _, _, U_piano = initialize_piano_mover()
    _, _, U_quad = initialize_quadrotor()
    _, _, U_cone = initialize_coneThroughWall()
    with h5py.File(os.path.join(REF, "systems", "polytopes.jld2"), "r") as f:
        A1, b1, A2, b2 = f["A1"][:], f["b1"][:], f["A2"][:], f["b2"][:]
    np.savez(
        os.path.join(OUT, "fixtures.npz"),
        piano_U0=np.asarray(U_piano),
        quadrotor_U0=np.asarray(U_quad),
        cone_U0=np.asarray(U_cone),
        A1=A1, b1=b1, A2=A2, b2=b2,
    )
    print("wrote fixtures.npz:",
          {k: np.asarray(v).shape for k, v in
           np.load(os.path.join(OUT, "fixtures.npz")).items()})


if __name__ == "__main__":
    main()
