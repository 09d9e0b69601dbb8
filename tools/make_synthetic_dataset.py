"""Procedural crop-structure dataset generator (flagship accuracy gate).

Real field data is unavailable in this sandbox (zero egress — see
ROADMAP.md), so this renders the closest feasible analog of the
reference's crop dataset (`/root/reference/README.md:32`, bean/maize
plants with a stem anchor and leaf parts, `labels.json`): textured soil
backgrounds, plants with a drawn stem whose base is the anchor
keypoint, species-distinct leaves attached by petiole lines, gray-stone
distractors, illumination jitter and sensor noise. Annotations follow
the public JSON schema (`/root/reference/README.md:40-69`).

The two species require real classification: bean leaves are round dark
ellipses, maize leaves long light blades, but both vary in size, angle
and hue so the label is not decidable from a single local color. Part
counts span 1..6 (leaf keypoints are rejection-sampled to stay
resolvable at the detector's Gaussian/NMS scale) so the `label_nparts`
classification buckets are populated.

Usage:
    python tools/make_synthetic_dataset.py OUT_DIR --train 300 --valid 60
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_REPO_ROOT = str(_Path(__file__).resolve().parents[1])
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)  # run as `python tools/x.py` without install


import argparse
import json
import math
from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw, ImageFilter

SIZE = 512


def _soil_background(rng: np.random.Generator) -> Image.Image:
    """Low-frequency brown-green mottle + high-frequency grain."""
    base = np.array(
        [rng.uniform(70, 110), rng.uniform(55, 90), rng.uniform(35, 60)], np.float32
    )
    # luminance-correlated mottle (clods/shadows), smoothly upsampled,
    # with a faint independent color cast so it is not pure grayscale
    lum = rng.normal(0.0, 16.0, size=(16, 16)).astype(np.float32)
    lum = np.asarray(Image.fromarray(lum, mode="F").resize((SIZE, SIZE), Image.BILINEAR))
    cast = rng.normal(0.0, 4.0, size=(8, 8, 3)).astype(np.float32)
    cast = np.stack([
        np.asarray(Image.fromarray(cast[..., c], mode="F").resize((SIZE, SIZE), Image.BILINEAR))
        for c in range(3)
    ], axis=-1)
    fine = rng.normal(0.0, 6.0, size=(SIZE, SIZE, 1)).astype(np.float32)
    img = base[None, None] + lum[..., None] * np.array([1.0, 0.95, 0.8], np.float32) + cast + fine
    img = np.clip(img, 0, 255).astype(np.uint8)
    return Image.fromarray(img).filter(ImageFilter.GaussianBlur(0.8))


def _rot(x: float, y: float, a: float) -> tuple[float, float]:
    return x * math.cos(a) - y * math.sin(a), x * math.sin(a) + y * math.cos(a)


def _draw_leaf(d: ImageDraw.ImageDraw, cx, cy, angle, species, rng):
    """Leaf polygon centered at (cx, cy) pointing along `angle`."""
    if species == "bean":
        ln = rng.uniform(16, 30)  # round-ish
        wd = ln * rng.uniform(0.55, 0.8)
        col = (
            int(rng.uniform(25, 60)),
            int(rng.uniform(95, 140)),
            int(rng.uniform(25, 55)),
        )
    else:  # maize: long thin blade
        ln = rng.uniform(34, 60)
        wd = ln * rng.uniform(0.12, 0.22)
        col = (
            int(rng.uniform(95, 140)),
            int(rng.uniform(150, 195)),
            int(rng.uniform(40, 75)),
        )
    pts = []
    for t in np.linspace(0.0, 2.0 * math.pi, 12, endpoint=False):
        px = (ln / 2) * math.cos(t)
        py = (wd / 2) * math.sin(t)
        rx, ry = _rot(px, py, angle)
        pts.append((cx + rx, cy + ry))
    d.polygon(pts, fill=col, outline=tuple(max(0, c - 25) for c in col))


def _draw_stone(d: ImageDraw.ImageDraw, rng):
    cx, cy = rng.uniform(0, SIZE), rng.uniform(0, SIZE)
    r = rng.uniform(4, 14)
    g = int(rng.uniform(110, 170))
    col = (g, g, int(g * rng.uniform(0.9, 1.0)))
    d.ellipse([cx - r, cy - r * 0.8, cx + r, cy + r * 0.8], fill=col)


MIN_KP_DIST = 28.0  # keep keypoints resolvable: the encode Gaussian's
# sigma at 512x512 is 0.1*128/3 grid cells ~ 17 input px, and 5x5
# plateau NMS suppresses peaks closer than ~10 px on the stride-4 grid


def _make_plant(d: ImageDraw.ImageDraw, rng, occupied, keypoints):
    """Draw one plant; returns object-dict or None if no room."""
    for _ in range(30):
        ax = rng.uniform(48, SIZE - 48)
        ay = rng.uniform(72, SIZE - 32)
        if all((ax - ox) ** 2 + (ay - oy) ** 2 > 190.0**2 for ox, oy in occupied):
            break
    else:
        return None
    occupied.append((ax, ay))
    keypoints.append((ax, ay))

    species = "bean" if rng.random() < 0.5 else "maize"
    n_leaves = int(rng.integers(1, 7))
    stem_h = rng.uniform(50, 110)
    lean = rng.uniform(-0.35, 0.35)
    tipx, tipy = ax + stem_h * math.sin(lean), ay - stem_h * math.cos(lean)

    # Species-distinct stem GEOMETRY near the anchor, like real crops
    # (maize: thick straight stalk; bean: thin curved stem). v3 drew
    # near-identical stems for both species, so the anchor channels —
    # which must classify the species at the stem base — could only
    # lean on leaves 50-150 px away: the trained model split its
    # confidence between the two species channels at the stem base and
    # anchor recall@0.4 stalled at 7% while leaf F1 reached 92%
    # (precision stayed 94%, i.e. peaks were right but under-confident).
    # Color ranges still overlap so the label is not a color lookup.
    if species == "maize":
        stem_col = (int(rng.uniform(70, 100)), int(rng.uniform(110, 140)),
                    int(rng.uniform(35, 60)))
        w0 = rng.uniform(6, 9)  # thick stalk, slight taper
        for t0, t1 in ((0.0, 0.5), (0.5, 1.0)):
            d.line([ax + (tipx - ax) * t0, ay + (tipy - ay) * t0,
                    ax + (tipx - ax) * t1, ay + (tipy - ay) * t1],
                   fill=stem_col, width=int(w0 * (1.0 - 0.35 * t0)))
    else:
        stem_col = (int(rng.uniform(80, 110)), int(rng.uniform(75, 105)),
                    int(rng.uniform(30, 55)))
        # curved polyline: quadratic bend whose control point swings
        # sideways; sturdier near the base than v4 (width 3-5) — the v4
        # probe showed bean stem *detection* (channel-sum >= 0.4) at only
        # 71% vs maize's 91%, i.e. thin 2-3 px stems were partly a
        # visibility problem, not just a classification one
        bend = rng.uniform(-22, 22)
        nx, ny = math.cos(lean), math.sin(lean)  # stem normal
        pts = []
        for t in np.linspace(0.0, 1.0, 8):
            px = ax + (tipx - ax) * t + bend * 2 * t * (1 - t) * nx
            py = ay + (tipy - ay) * t + bend * 2 * t * (1 - t) * ny
            pts.append((px, py))
        d.line(pts, fill=stem_col, width=int(rng.uniform(3, 5)), joint="curve")
        # v5: cotyledon pair at the stem base — the dicot's first two
        # seed leaves, which maize (a monocot) never has. The v4 probe
        # showed bean anchors still SPLIT species confidence at the stem
        # base (own-channel median 0.236 vs best-other 0.29) because the
        # curved-vs-straight stem cue is weak at the detector's stride-4
        # scale; cotyledons are real crops' local species evidence.
        # Small (r 4-6, below the annotated-leaf size range 16-30) and
        # darker than true leaves so they do not read as leaf keypoints.
        cot_col = (int(rng.uniform(20, 45)), int(rng.uniform(75, 110)),
                   int(rng.uniform(20, 45)))
        for side in (-1.0, 1.0):
            coff = rng.uniform(8, 14)
            cx = ax + side * coff * nx + rng.uniform(-2, 2)
            cy = ay + side * coff * ny - rng.uniform(2, 7)
            cr = rng.uniform(4, 6)
            d.ellipse([cx - cr, cy - cr * 0.8, cx + cr, cy + cr * 0.8],
                      fill=cot_col,
                      outline=tuple(max(0, c - 20) for c in cot_col))

    def stem_point(t: float) -> tuple[float, float]:
        """Point on the drawn stem at parameter t (follows bean's bend)."""
        px = ax + (tipx - ax) * t
        py = ay + (tipy - ay) * t
        if species == "bean":
            px += bend * 2 * t * (1 - t) * nx
            py += bend * 2 * t * (1 - t) * ny
        return px, py

    parts = [{"kind": "stem", "location": {"x": round(ax, 1), "y": round(ay, 1)}, "score": None}]
    for i in range(n_leaves):
        # leaves fan out from points along the stem; resample until the
        # keypoint clears MIN_KP_DIST from every other keypoint so the
        # task is resolvable at the detector's Gaussian/NMS scale
        for _ in range(40):
            t = rng.uniform(0.35, 1.0)
            bx, by = stem_point(t)
            side = 1.0 if (i % 2 == 0) else -1.0
            ang = lean + side * rng.uniform(0.4, 1.6)
            reach = rng.uniform(26, 60)
            lx = bx + reach * math.sin(ang)
            ly = by - reach * math.cos(ang) * rng.uniform(0.2, 0.9)
            lx = float(np.clip(lx, 6, SIZE - 6))
            ly = float(np.clip(ly, 6, SIZE - 6))
            if all((lx - kx) ** 2 + (ly - ky) ** 2 >= MIN_KP_DIST**2
                   for kx, ky in keypoints):
                break
        else:
            continue  # no clear spot for this leaf: draw fewer
        keypoints.append((lx, ly))
        d.line([bx, by, lx, ly], fill=stem_col, width=2)
        _draw_leaf(d, lx, ly, ang + math.pi / 2 * rng.uniform(0.7, 1.3), species, rng)
        parts.append({"kind": "leaf", "location": {"x": round(lx, 1), "y": round(ly, 1)}, "score": None})

    # anchor marker: dark node at the stem base, sized with the stem
    # (maize stalk base is visibly broader than bean's)
    r = 5.5 if species == "maize" else 3.5
    d.ellipse([ax - r, ay - r, ax + r, ay + r],
              fill=tuple(max(0, c - 35) for c in stem_col))
    return {"label": species, "box": None, "parts": parts}


def render_image(rng: np.random.Generator):
    img = _soil_background(rng)
    d = ImageDraw.Draw(img)
    for _ in range(int(rng.integers(3, 10))):
        _draw_stone(d, rng)

    objects = []
    occupied: list[tuple[float, float]] = []
    keypoints: list[tuple[float, float]] = []
    total_parts = 0
    for _ in range(int(rng.integers(2, 6))):
        obj = _make_plant(d, rng, occupied, keypoints)
        if obj is None:
            continue
        n_leaf = len(obj["parts"]) - 1
        if total_parts + n_leaf > 30:  # stay under the max_parts=40 budget
            break
        total_parts += n_leaf
        objects.append(obj)

    # illumination jitter + mild sensor noise
    arr = np.asarray(img).astype(np.float32)
    arr = arr * rng.uniform(0.85, 1.15) + rng.uniform(-12, 12)
    arr += rng.normal(0, 3.5, arr.shape)
    img = Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))
    return img, objects


def write_split(out: Path, n: int, seed: int):
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        img, objects = render_image(rng)
        stem = f"im_{i:04d}"
        img.save(out / f"{stem}.jpg", quality=92)
        (out / f"{stem}.json").write_text(json.dumps({
            "image_path": str(out / f"{stem}.jpg"),
            "img_size": [SIZE, SIZE],
            "objects": objects,
        }))
    print(f"{out}: {n} images")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", type=Path)
    ap.add_argument("--train", type=int, default=300)
    ap.add_argument("--valid", type=int, default=60)
    ap.add_argument("--seed", type=int, default=926354916)
    args = ap.parse_args()
    write_split(args.out / "train", args.train, args.seed)
    write_split(args.out / "valid", args.valid, args.seed + 1)


if __name__ == "__main__":
    main()
