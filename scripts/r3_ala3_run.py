"""Round-3 ALA3 science loop, one process end-to-end (resumable).

On a tunneled accelerator every process start pays a multi-minute claim
stall, so the whole loop — data, umbrella, train, eval, science — runs in
ONE process.  Phases whose artifact already exists are skipped; delete the
artifact to force a re-run.

Run:  python scripts/r3_ala3_run.py [n_res] [--skip=data,umbrella,...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bgflow_tpu.utils.backend import ensure_reachable_backend

ensure_reachable_backend()

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kv = dict(f.lstrip("-").split("=", 1) for f in sys.argv[1:] if f.startswith("--") and "=" in f)
    n_res = int(args[0]) if args else 3
    skip = set(kv.get("skip", "").split(",")) - {""}
    n_iter = int(kv.get("iters", 24000))
    gbsa = "--gbsa" in sys.argv[1:]

    import polyala_demo as pd
    from bgflow_tpu.utils.checkpoint import latest_step

    global ART
    if gbsa:
        pd.IMPLICIT_SOLVENT = True
        pd.ART = os.path.join(pd.ART, "gbsa")
        ART = os.path.join(ART, "gbsa")
        os.makedirs(ART, exist_ok=True)

    def stamp(msg):
        print(f"[r3 {time.strftime('%H:%M:%S')}] {msg}", flush=True)

    t0 = time.time()
    if "data" not in skip and not os.path.exists(
            os.path.join(ART, f"polyala{n_res}_data.npz")):
        stamp("data phase")
        pd.data_phase(n_res)
        stamp(f"data done at {time.time()-t0:.0f}s")
    if "umbrella" not in skip and not os.path.exists(
            os.path.join(ART, f"polyala{n_res}_umbrella.npz")):
        stamp("umbrella phase")
        pd.umbrella_phase(n_res)
        stamp(f"umbrella done at {time.time()-t0:.0f}s")
    ckpt = os.path.join(ART, f"polyala{n_res}_ckpt")
    if "train" not in skip and latest_step(ckpt) != n_iter:
        stamp("train phase (baseline, weighted ladder data)")
        pd.train_phase(n_res, n_iter=n_iter)
        stamp(f"train done at {time.time()-t0:.0f}s")
    if "eval" not in skip:
        stamp("eval phase")
        pd.eval_phase(n_res)
        stamp(f"eval done at {time.time()-t0:.0f}s")
    if "science" not in skip:
        stamp("science phase")
        import polyala_science  # noqa: F401  (runs main() below)

        sys.argv = ["polyala_science.py", str(n_res)] + (
            ["--gbsa"] if gbsa else [])
        polyala_science.main()
        stamp(f"science done at {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
