"""Patch a `.turbo.npz` sidecar's SERVING config in place (no re-distill).

The turbo sidecar's student weights are independent of the serving-time
placement knobs (`n_importance`, `proposal_subsample` — RenderSettings);
those live in the sidecar metadata so `NeRFRenderer(preset="turbo")` serves
the configuration the student was quality-gated at
(`scripts/validate_quality.py --turbo [--prop-subsample N]`). This rewrites
only that metadata, e.g. after a new gate passes at a cheaper placement:

    python scripts/set_turbo_serving_config.py assets/bench/synth_proposal.turbo.npz \
        --prop-subsample 4 [--n-importance 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sidecar", help=".turbo.npz path to patch in place")
    ap.add_argument("--n-importance", type=int, default=None)
    ap.add_argument("--prop-subsample", type=int, default=None)
    args = ap.parse_args()

    with np.load(args.sidecar) as arrays:
        data = {k: arrays[k] for k in arrays.files}
    meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
    if not meta.get("turbo"):
        raise SystemExit(f"{args.sidecar} is not a turbo sidecar")
    before = dict(meta["student"])
    # The embedded distill_report's numbers were measured at the PRE-patch
    # serving config; make that explicit so the re-stamped sidecar never
    # presents them as current-config measurements (ADVICE r3).
    if "distill_report" in meta and "measured_at" not in meta["distill_report"]:
        meta["distill_report"]["measured_at"] = {
            "n_importance": before.get("n_importance"),
            "proposal_subsample": before.get("proposal_subsample"),
        }
    if args.n_importance is not None:
        meta["student"]["n_importance"] = int(args.n_importance)
    if args.prop_subsample is not None:
        meta["student"]["proposal_subsample"] = int(args.prop_subsample)
    data["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(args.sidecar, **data)
    print(f"{args.sidecar}: student {before} -> {meta['student']}")


if __name__ == "__main__":
    main()
