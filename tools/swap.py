#!/usr/bin/env python
"""Channel-rotation tool: decode a QOI image, rotate its color channels,
re-encode in place (or to a new file).

Mirrors the reference's 03_swap example (example/source/03_swap.cpp:43-67),
which demonstrates the decode -> functional re-encode pipeline via the
PixelGenFun generator API; pass --generator-api to exercise that callback
path here too (slow, per-pixel Python), default is the vectorized path.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import qoipp_tpu as q


def main(argv=None):
    p = argparse.ArgumentParser(description="Rotate QOI color channels (r->g->b->r)")
    p.add_argument("input", type=Path)
    p.add_argument("-o", "--output", type=Path, default=None,
                   help="output path (default: in place)")
    p.add_argument("-n", "--rotations", type=int, default=1)
    p.add_argument("--generator-api", action="store_true",
                   help="re-encode through the PixelGenFun callback API")
    p.add_argument("--backend", default="auto", choices=("auto", "native", "jax"))
    args = p.parse_args(argv)

    out = args.output or args.input
    t0 = time.perf_counter()
    res = q.decode(args.input, backend=args.backend)
    if not res:
        print(f"error: {q.to_string(res.error())}", file=sys.stderr)
        return 1
    img = res.value()
    ch = int(img.desc.channels)
    px = img.data.reshape(-1, ch)

    r = args.rotations % 3
    order = np.roll(np.arange(3), r)
    if ch == 4:
        order = np.concatenate([order, [3]])
    rotated = px[:, order]

    if args.generator_api:
        def gen(i):
            row = rotated[i]
            return q.Pixel(int(row[0]), int(row[1]), int(row[2]),
                           int(row[3]) if ch == 4 else 0xFF)

        enc = q.encode(gen, img.desc, backend="native")
    else:
        enc = q.encode(rotated.reshape(-1), img.desc, backend=args.backend)
    if not enc:
        print(f"error: {q.to_string(enc.error())}", file=sys.stderr)
        return 1
    out.write_bytes(enc.value().tobytes())
    print(
        f"{args.input} -> {out}: rotated {r}x "
        f"({img.desc.width}x{img.desc.height}x{ch}) "
        f"[{(time.perf_counter()-t0)*1e3:.1f} ms]"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
