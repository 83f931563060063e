"""Round-4 GBSA ALA3 convergence campaign — one process, end-to-end.

Regenerates the whole solvated pipeline under the corrected per-type
mbondi2 radii (N-bonded H = 0.13 nm) and closes the NeuTra bootstrap loop
the round-3 verdict called for:

  stage data     — HMC+REX ladder ensemble (GBSA target)
  stage umbrella — per-dihedral masked-CV umbrella sweeps + joint MBAR
  stage base     — weighted-NLL baseline train + quick eval
  stage neutra   — flow-preconditioned HMC regeneration through the
                   baseline checkpoint
  stage ntrain   — retrain on the NeuTra ensemble + eval + science

Run:  python scripts/r4_gbsa_campaign.py [n_res] [--stages=data,umbrella,...]
      [--iters=N] [--nt_iters=N]
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
    kv = dict(
        f.lstrip("-").split("=", 1)
        for f in sys.argv[1:]
        if f.startswith("--") and "=" in f
    )
    n_res = int(args[0]) if args else 3
    n_iter = int(kv.get("iters", 16000))
    nt_iter = int(kv.get("nt_iters", 16000))
    stages = kv.get("stages", "data,umbrella,base,neutra,ntrain").split(",")

    import polyala_demo as pd

    pd.IMPLICIT_SOLVENT = True
    pd.ART = os.path.join(pd.ART, "gbsa")
    os.makedirs(pd.ART, exist_ok=True)

    t0 = time.time()

    def stamp(msg):
        print(f"[r4 {time.strftime('%H:%M:%S')} +{time.time()-t0:.0f}s] {msg}",
              flush=True)

    if "data" in stages:
        stamp("data phase (GBSA ladder)")
        pd.data_phase(n_res)
    if "umbrella" in stages:
        stamp("umbrella phase")
        pd.umbrella_phase(n_res)
    if "base" in stages:
        stamp(f"baseline train ({n_iter} iters)")
        pd.train_phase(n_res, n_iter=n_iter)
        stamp("baseline eval")
        pd.eval_phase(n_res, n_eval=50000)
    if "neutra" in stages:
        stamp("neutra regeneration through baseline checkpoint")
        pd.neutra_phase(n_res)
    if "ntrain" in stages:
        stamp(f"retrain on neutra ensemble ({nt_iter} iters)")
        pd.train_phase(n_res, n_iter=nt_iter, neutra=True)
        stamp("neutra eval")
        pd.eval_phase(n_res, n_eval=50000, neutra=True)
        stamp("science (neutra)")
        import polyala_science

        sys.argv = ["polyala_science.py", str(n_res), "--gbsa", "--neutra"]
        polyala_science.main()
    stamp("campaign done")


if __name__ == "__main__":
    main()
