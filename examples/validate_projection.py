"""Full physical-validation report for the projection solver — the PERF.md
"projection-solver validation" table (quantitative replacement for the
reference's body-fitted icoFoam ground truth, SURVEY.md §7.3(2)).

Runs: Ghia cavity tables (Re 100/400, muscl + the round-3 upwind1 for
contrast), cylinder Strouhal/drag at Re_d 100/150, and the Richardson
convergence triplet. ~4 minutes on CPU; pass --fast for a smoke subset.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--schemes", default="muscl,upwind1")
    args = ap.parse_args()

    from pregen_pde_tpu.utils.misc import use_best_backend

    use_best_backend()
    from pregen_pde_tpu.solvers import validation as V

    out = {"cavity": [], "cylinder": [], "order": []}
    schemes = args.schemes.split(",")
    res = 64 if args.fast else 128
    for scheme in schemes:
        for re in ([100] if args.fast else [100, 400]):
            r = V.run_cavity(re, n=res, advection=scheme,
                             t_end=5.0 if args.fast else None)
            r.pop("u_model"), r.pop("v_model"), r.pop("u_ghia"), r.pop("v_ghia")
            out["cavity"].append(r)
            print(json.dumps(r), flush=True)
        for re_d in ([150.0] if args.fast else [100.0, 150.0]):
            r = V.run_cylinder(re_d, n=res, advection=scheme,
                               t_end=20.0 if args.fast else 80.0)
            out["cylinder"].append(r)
            print(json.dumps(r), flush=True)
        r = V.convergence_order(ns=(16, 32, 64) if args.fast else (32, 64, 128),
                                advection=scheme)
        out["order"].append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
