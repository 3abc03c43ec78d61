"""Render an on-disk files-layout training corpus (PNG + annotation.txt).

The environment has no IAM/plates mount, so end-to-end host-pipeline
measurements (VERDICT r3 #1 / SURVEY §3.5) need a real image corpus on
disk. This renders FontTextlines samples (PIL + TrueType — the same
generator behind `--dataset fonts`) into the reference's annotation layout:

    <out>/images/00000000.png ...
    <out>/annotation.txt          lines of "images/<name>.png\\t<text>"

Usage:  python tools/make_font_corpus.py --out /tmp/fonts10k --n 10000
(Pure host work; forces the CPU backend so it can run next to a TPU job.)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=10000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_words", type=int, default=2)
    p.add_argument("--min_words", type=int, default=1)
    p.add_argument("--noise", type=float, default=0.02,
                   help="render-time Gaussian noise std (fraction of 255); "
                        "0.08+ with small glyphs yields a hard task whose "
                        "trained model plateaus at nonzero CER")
    p.add_argument("--min_size", type=int, default=18)
    p.add_argument("--max_size", type=int, default=26)
    p.add_argument("--blur", type=float, default=0.0,
                   help="max Gaussian blur radius (sampled U[0, blur])")
    p.add_argument("--contrast_min", type=float, default=1.0,
                   help="min ink/paper contrast factor (sampled U[min, 1])")
    p.add_argument("--downscale_min", type=float, default=1.0,
                   help="min resolution-loss scale (render->down->up)")
    p.add_argument("--warp_shear", type=float, default=0.0,
                   help="max |horizontal shear| (render-time geometric "
                        "distortion, the STN A/B corpus knob)")
    p.add_argument("--warp_rotate", type=float, default=0.0,
                   help="max |rotation| in degrees (render-time)")
    p.add_argument("--warp_perspective", type=float, default=0.0,
                   help="max corner jitter as a fraction of line height "
                        "(render-time perspective)")
    p.add_argument("--max_w_new", type=int, default=0,
                   help="skip images whose height-32-normalized width "
                        "exceeds this (0 = keep all); e.g. 128 yields a "
                        "single-bucket corpus for apples-to-apples "
                        "device-ceiling comparisons")
    args = p.parse_args(argv)

    import cv2

    from crnn_ocr_tpu.data.fontgen import FontConfig, FontTextlines

    synth = FontTextlines(FontConfig(
        max_words=args.max_words, min_words=args.min_words,
        noise=args.noise, min_size=args.min_size, max_size=args.max_size,
        blur=args.blur, contrast_min=args.contrast_min,
        downscale_min=args.downscale_min,
        warp_shear=args.warp_shear, warp_rotate=args.warp_rotate,
        warp_perspective=args.warp_perspective,
    ))
    img_dir = os.path.join(args.out, "images")
    os.makedirs(img_dir, exist_ok=True)
    lines = []
    rng = np.random.default_rng(args.seed)
    B = 256
    i = 0
    while i < args.n:
        k = min(B, args.n - i)
        images, texts = synth.sample_batch(k, rng)
        for img, text in zip(images, texts):
            if args.max_w_new:
                h, w = img.shape[:2]
                if round(w * 32 / h) > args.max_w_new:
                    continue
            rel = f"images/{i:08d}.png"
            cv2.imwrite(os.path.join(args.out, rel), img)
            lines.append(f"{rel}\t{text}")
            i += 1
        print(f"\r{i}/{args.n}", end="", file=sys.stderr)
    with open(os.path.join(args.out, "annotation.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nwrote {args.n} images + annotation.txt under {args.out}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
