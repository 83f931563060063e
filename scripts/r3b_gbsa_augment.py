"""GBSA ALA3, umbrella-augmented training variant — one process end-to-end.

The baseline GBSA rung (artifacts/gbsa/polyala3_science.json) halves the
vacuum PMF error but keeps the heavy right logw tail; the augment variant
trains on the exact ensemble + bin-flattened umbrella frames (near-uniform
per-dihedral coverage), which targets exactly the under-covered regions the
forensics identified.

Run:  python scripts/r3b_gbsa_augment.py [n_res] [--iters=N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bgflow_tpu.utils.backend import ensure_reachable_backend

ensure_reachable_backend()


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kv = dict(f.lstrip("-").split("=", 1) for f in sys.argv[1:] if f.startswith("--") and "=" in f)
    n_res = int(args[0]) if args else 3
    n_iter = int(kv.get("iters", 16000))

    import polyala_demo as pd

    pd.IMPLICIT_SOLVENT = True
    pd.ART = os.path.join(pd.ART, "gbsa")
    os.makedirs(pd.ART, exist_ok=True)

    def stamp(msg):
        print(f"[r3b {time.strftime('%H:%M:%S')}] {msg}", flush=True)

    t0 = time.time()
    stamp("train phase (augment, GBSA)")
    pd.train_phase(n_res, n_iter=n_iter, augment=True)
    stamp(f"train done at {time.time()-t0:.0f}s")
    stamp("eval phase")
    pd.eval_phase(n_res, augment=True)
    stamp(f"eval done at {time.time()-t0:.0f}s")
    stamp("science phase")
    import polyala_science

    sys.argv = ["polyala_science.py", str(n_res), "--gbsa", "--augment"]
    polyala_science.main()
    stamp(f"science done at {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
