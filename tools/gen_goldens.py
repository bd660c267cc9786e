"""Generate golden test fixtures by running the reference implementation at
/root/reference as a numerical oracle.  Only *data* (JSON arrays) is stored in
this repo; no reference code is copied.

Usage:  python tools/gen_goldens.py
"""

import json
import os
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
sys.path.insert(0, REF)

from primitives.misc_primitive_constructor import (  # noqa: E402
    SphereMRP, PolytopeMRP, ConeMRP, PolygonMRP, CylinderMRP, CapsuleMRP,
    create_rect_prism, create_n_sided,
)
from primitives.problem_matrices import problem_matrices, dcm_from_mrp  # noqa: E402
from primitives.combine_problem_matrices import combine_problem_matrices  # noqa: E402
from proximity.pdip import solve_lp_pdip  # noqa: E402
from proximity.proximity import proximity_mrp  # noqa: E402
from proximity.proximity_gradient import proximity_gradient  # noqa: E402


def J(a):
    return np.asarray(a, dtype=float).tolist()


def make_prims(rng):
    """A representative primitive of each kind with a random pose."""
    prisms = create_rect_prism(2.5, 0.15, 0.01)
    ngon = create_n_sided(5, 0.6)
    prims = {
        "polytope": prisms,
        "sphere": SphereMRP(radius=0.8),
        "cone": ConeMRP(height=2.0, beta=np.deg2rad(22)),
        "capsule": CapsuleMRP(radius=0.2, height=5.0),
        "cylinder": CylinderMRP(radius=0.6, height=3.0),
        "polygon": PolygonMRP(ngon["A"], ngon["b"], 0.2),
    }
    for p in prims.values():
        p.r = rng.standard_normal(3) * 2.0
        p.p = rng.standard_normal(3) * 0.4
    return prims


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(0)

    # --- MRP / DCM goldens ------------------------------------------------
    mrp_cases = []
    for _ in range(5):
        p = rng.standard_normal(3)
        mrp_cases.append({"p": J(p), "dcm": J(dcm_from_mrp(p))})
    with open(os.path.join(OUT, "mrp.json"), "w") as f:
        json.dump(mrp_cases, f)

    # --- per-primitive problem matrices ----------------------------------
    prims = make_prims(rng)
    blocks = {}
    for name, pr in prims.items():
        G_ort, h_ort, G_soc, h_soc = problem_matrices(pr, pr.r, pr.p)
        G_ort = np.atleast_2d(G_ort)
        blocks[name] = {
            "r": J(pr.r), "p": J(pr.p),
            "G_ort": J(G_ort), "h_ort": J(h_ort),
            "G_soc": J(np.atleast_2d(G_soc)), "h_soc": J(h_soc),
        }
    with open(os.path.join(OUT, "prim_blocks.json"), "w") as f:
        json.dump(blocks, f)

    # --- pair combination + PDIP solutions + envelope gradients ----------
    kinds = list(prims)
    pair_cases = []
    rng2 = np.random.default_rng(1)
    for i, k1 in enumerate(kinds):
        for k2 in kinds:
            p1, p2 = prims[k1], prims[k2]
            # place them a couple units apart so alpha is well-defined
            p1.r = rng2.standard_normal(3) * 1.5
            p2.r = p1.r + rng2.standard_normal(3) * 3.0 + np.array([2.5, 0, 0])
            p1.p = rng2.standard_normal(3) * 0.4
            p2.p = rng2.standard_normal(3) * 0.4
            G_ort1, h_ort1, G_soc1, h_soc1 = problem_matrices(p1, p1.r, p1.p)
            G_ort2, h_ort2, G_soc2, h_soc2 = problem_matrices(p2, p2.r, p2.p)
            G_ort1, G_ort2 = np.atleast_2d(G_ort1), np.atleast_2d(G_ort2)
            try:
                # NOTE: the reference's combine case (v1>4 and v2>4) is broken
                # (G_ort1 is never column-padded, combine_problem_matrices.py:58-67)
                # so e.g. capsule-vs-polygon raises; those pairs are skipped here
                # and covered by self-consistency tests instead.
                c, G, h, idx_ort, idx_soc1, idx_soc2 = combine_problem_matrices(
                    G_ort1, h_ort1, G_soc1, h_soc1, G_ort2, h_ort2, G_soc2, h_soc2)
                x, s, z = solve_lp_pdip(c, G, h, idx_ort, idx_soc1, idx_soc2,
                                        pdip_tol=1e-10)
                alpha, grad = proximity_gradient(p1, p2, pdip_tol=1e-10)
            except Exception as e:  # noqa: BLE001
                print("skip", k1, k2, e)
                continue
            pair_cases.append({
                "k1": k1, "k2": k2,
                "r1": J(p1.r), "p1": J(p1.p), "r2": J(p2.r), "p2": J(p2.p),
                "c": J(c), "G": J(G), "h": J(h),
                "n_ort": len(idx_ort), "n_soc1": len(idx_soc1), "n_soc2": len(idx_soc2),
                "x": J(x), "alpha": float(x[3]), "grad": J(grad),
            })
    with open(os.path.join(OUT, "pairs.json"), "w") as f:
        json.dump(pair_cases, f)
    print(f"wrote {len(pair_cases)} pair cases")


if __name__ == "__main__":
    main()
