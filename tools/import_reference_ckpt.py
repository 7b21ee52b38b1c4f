#!/usr/bin/env python
"""Convert a reference torch ``.pth`` checkpoint into this framework's
msgpack format.

    python tools/import_reference_ckpt.py SRC.pth DST.ckpt \
        [--model LightGCN] [--n-users N] [--n-items N] [--table-align A]

Handles both reference formats (raw ``state_dict`` — reference
model.py:49-53 — and the IGCN-family ``{'sate_dict', 'user_map',
'item_map', 'alpha'}`` wrapper, model.py:4208-4220); the model class is
inferred from the tensor names when ``--model`` is omitted.

- IGCN-family core maps are python dicts in the reference; pass
  ``--n-users/--n-items`` (the catalog sizes) so the densified -1-padded
  arrays cover non-core tail nodes.
- ``--table-align A`` zero-pads embedding-table rows to multiples of A
  (match the repo model's ``table_align``; padding rows are never indexed).
- Extracting the pretrained LightGCN table IDCF_LGCN needs
  (``lgcn_path``, model.py:3905-3908): convert the LightGCN run's .pth
  as-is — the output loads directly via ``model_config['lgcn_path']``.
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable from a source checkout without installation
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("src", help="reference torch .pth checkpoint")
    ap.add_argument("dst", help="output msgpack checkpoint path")
    ap.add_argument("--model", default=None, help="reference model class name")
    ap.add_argument("--n-users", type=int, default=None)
    ap.add_argument("--n-items", type=int, default=None)
    ap.add_argument(
        "--table-align",
        type=int,
        default=1,
        help="row-align embedding tables to this multiple (repo table_align)",
    )
    args = ap.parse_args(argv)

    import numpy as np

    from inductive_recommendation_tpu.train.checkpoint import save_checkpoint
    from inductive_recommendation_tpu.train.import_reference import (
        convert_reference_state,
        load_torch_payload,
    )

    payload = load_torch_payload(args.src)
    params, aux = convert_reference_state(
        payload, model_name=args.model, n_users=args.n_users, n_items=args.n_items
    )
    if args.table_align > 1:
        a = args.table_align

        def pad(x):
            x = np.asarray(x)
            rows = -(-x.shape[0] // a) * a
            if rows == x.shape[0]:
                return x
            out = np.zeros((rows,) + x.shape[1:], x.dtype)
            out[: x.shape[0]] = x
            return out

        # only the *embedding* tables are row-aligned in the repo's
        # init_params; linear weights must keep their exact shapes
        params = {
            k: (pad(v) if "embedding" in k else v) for k, v in params.items()
        }
    save_checkpoint(args.dst, params, aux=aux)
    leaves = []

    def walk(t, pfx=""):
        if isinstance(t, dict):
            for k, v in t.items():
                walk(v, f"{pfx}{k}.")
        elif isinstance(t, (list, tuple)):
            for i, v in enumerate(t):
                walk(v, f"{pfx}{i}.")
        else:
            leaves.append(f"{pfx.rstrip('.')}: {np.asarray(t).shape}")

    walk(params)
    print(f"wrote {args.dst}")
    for line in leaves:
        print(" ", line)
    if aux:
        print("  aux:", ", ".join(sorted(aux)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
