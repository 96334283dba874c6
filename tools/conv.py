#!/usr/bin/env python
"""PNG <-> QOI converter CLI.

Mirrors the reference's 02_conv example (example/source/02_conv.cpp:182-244:
direction inferred from extensions, --rgb-only flag, timing printouts).
PNG I/O via Pillow.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import qoipp_tpu as q


def load_png(path, rgb_only):
    from PIL import Image as PILImage

    im = PILImage.open(path)
    if im.mode not in ("RGB", "RGBA"):
        im = im.convert("RGBA" if ("A" in im.mode or im.mode == "P") else "RGB")
    if rgb_only and im.mode == "RGBA":
        im = im.convert("RGB")
    arr = np.asarray(im, dtype=np.uint8)
    ch = q.Channels.RGBA if arr.shape[-1] == 4 else q.Channels.RGB
    desc = q.Desc(arr.shape[1], arr.shape[0], ch)
    return arr.reshape(-1), desc


def save_png(path, img: "q.Image"):
    from PIL import Image as PILImage

    mode = "RGBA" if img.desc.channels == q.Channels.RGBA else "RGB"
    arr = img.data.reshape(img.desc.height, img.desc.width, int(img.desc.channels))
    PILImage.fromarray(arr, mode).save(path)


def main(argv=None):
    p = argparse.ArgumentParser(description="Convert PNG<->QOI")
    p.add_argument("input", type=Path)
    p.add_argument("output", type=Path)
    p.add_argument("--rgb-only", action="store_true",
                   help="drop alpha when converting PNG->QOI")
    p.add_argument("--backend", default="auto", choices=("auto", "native", "jax"))
    p.add_argument("-f", "--force", action="store_true", help="overwrite")
    args = p.parse_args(argv)

    src, dst = args.input.suffix.lower(), args.output.suffix.lower()
    if not args.input.exists():
        print(f"error: {args.input} does not exist", file=sys.stderr)
        return 1

    if src == ".png" and dst == ".qoi":
        t0 = time.perf_counter()
        raw, desc = load_png(args.input, args.rgb_only)
        t_load = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = q.encode_into(args.output, raw, desc, overwrite=args.force,
                            backend=args.backend)
        t_enc = time.perf_counter() - t0
        if not res:
            print(f"error: {q.to_string(res.error())}", file=sys.stderr)
            return 1
        print(
            f"{args.input} ({desc.width}x{desc.height}x{int(desc.channels)}) "
            f"-> {args.output} ({res.value()} bytes) "
            f"[load {t_load*1e3:.1f} ms, encode {t_enc*1e3:.1f} ms]"
        )
    elif src == ".qoi" and dst == ".png":
        t0 = time.perf_counter()
        res = q.decode(args.input, backend=args.backend)
        t_dec = time.perf_counter() - t0
        if not res:
            print(f"error: {q.to_string(res.error())}", file=sys.stderr)
            return 1
        if args.output.exists() and not args.force:
            print(f"error: {args.output} exists (use -f)", file=sys.stderr)
            return 1
        t0 = time.perf_counter()
        save_png(args.output, res.value())
        t_save = time.perf_counter() - t0
        d = res.value().desc
        print(
            f"{args.input} -> {args.output} "
            f"({d.width}x{d.height}x{int(d.channels)}) "
            f"[decode {t_dec*1e3:.1f} ms, save {t_save*1e3:.1f} ms]"
        )
    else:
        print("error: need .png->.qoi or .qoi->.png", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
