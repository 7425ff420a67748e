"""Scanned-page OCR: the missing front of the reference's advertised
multi-modal PDF pipeline.

The reference README advertises PDF preprocessing for scanned filings
(/root/reference/README.md:17-19) but ships none of it — ingestion starts
at processed JSON (/root/reference/src/load_data.py:58-78). This module
closes that gap for page IMAGES (the image ships no PDF parser, so a
rasterized page is the input contract; real deployments rasterize with any
external tool):

  page image (np.uint8 [H, W] grayscale)
    -> line segmentation (horizontal ink-projection profile, host numpy)
    -> glyph segmentation (vertical projection per line; spaces from
       gap widths)
    -> batched glyph classification by a small Flax conv net (the ONE
       device hot loop: all glyph crops of a page classified in one jitted
       forward — MXU-shaped [N, 24, 16] batch, bf16-friendly)
    -> text -> ingest.chunker -> processed-JSON contract.

No pretrained checkpoints exist in this environment (zero egress), so the
recognizer is TRAINED IN-REPO on synthetically rendered glyphs
(randomized font family / size / sub-pixel placement / rotation /
gaussian noise) — the same trained-fixture technique the quality-parity
eval uses. ``FONT_FAMILIES`` lists the system families available for
rendering (DejaVu Sans / Serif / Mono + bold variants, plus PIL's
bundled default); ``train_ocr(fonts=...)`` trains one classifier across
any subset, and ``accuracy_report`` measures per-font round-trip
accuracy. Scope: this is a SYNTHETIC-RENDER contract — clean rasterized
text lines plus gaussian noise, not photographed documents; a production
deployment retrains ``train_ocr`` on its scanner's glyph distribution
the same way. Per-font numbers live in OCR_r04.json (single-font ~99%
clean; the residual is each font's genuinely identical 'l'/'I' pair plus
word-space boundaries whose gap geometry provably collides).
"""

from __future__ import annotations

import json
import os
import string
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

# glyph crop size fed to the classifier (H x W)
GLYPH_H, GLYPH_W = 24, 16
# default recognizable charset: printable ASCII minus whitespace controls
CHARSET = string.digits + string.ascii_letters + string.punctuation
# composite classes for glyph pairs that weld at the pixel level in this
# font: a ',' tucks under the preceding digit's curve ("3,902") into one
# connected component no vertical cut can separate — so the classifier
# learns the welded pair as its own class and emits both characters
WELD_TOKENS = tuple(f"{d}," for d in string.digits)


# ---------------------------------------------------------------------------
# rendering (training data + test fixtures + demo pages)
# ---------------------------------------------------------------------------
# system font families usable for rendering; "default" is PIL's bundled
# font (always present). Families whose .ttf is missing from the host are
# skipped by available_fonts() rather than erroring.
FONT_FAMILIES = {
    "default": None,
    "dejavu-sans": "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "dejavu-sans-bold": "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
    "dejavu-serif": "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
    "dejavu-serif-bold":
        "/usr/share/fonts/truetype/dejavu/DejaVuSerif-Bold.ttf",
    "dejavu-mono": "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
}


def available_fonts() -> List[str]:
    """Family names renderable on this host (ttf present, or 'default')."""
    return [name for name, path in FONT_FAMILIES.items()
            if path is None or os.path.exists(path)]


def _font(size: int, family: str = "default"):
    from PIL import ImageFont

    path = FONT_FAMILIES.get(family, None) if family != "default" else None
    if family != "default" and family not in FONT_FAMILIES:
        raise ValueError(f"unknown font family {family!r}; "
                         f"known: {sorted(FONT_FAMILIES)}")
    if path is not None and os.path.exists(path):
        return ImageFont.truetype(path, size=size)
    return ImageFont.load_default(size=size)


def render_page(text: str, width: int = 1024, font_size: int = 16,
                margin: int = 16, line_gap: int = 6,
                noise: float = 0.0, seed: int = 0,
                font_family: str = "default") -> np.ndarray:
    """Rasterize ``text`` (newline-separated lines) into a grayscale page
    image, optionally with gaussian noise — the synthetic 'scanned page'
    used for training and tests."""
    from PIL import Image, ImageDraw

    font = _font(font_size, font_family)
    lines = text.split("\n")
    height = margin * 2 + len(lines) * (font_size + line_gap)
    im = Image.new("L", (width, height), 255)
    draw = ImageDraw.Draw(im)
    y = margin
    for line in lines:
        draw.text((margin, y), line, font=font, fill=0)
        y += font_size + line_gap
    arr = np.asarray(im, np.float32)
    if noise > 0:
        rng = np.random.default_rng(seed)
        arr = arr + rng.normal(0.0, noise * 255.0, arr.shape)
    return np.clip(arr, 0, 255).astype(np.uint8)


# Anchor pairs bracketing each training glyph: they set the line band the
# way real neighbours do. Varied so the model sees every band shape —
# ascender+descender, ascender-only, x-height-only, digits.
_ANCHORS = ("Hy", "lq", "Ag", "xo", "Mp", "Hl", "mn", "09")


def _render_train_line(ch: str, anchor: str, font_size: int,
                       font_family: str = "default") -> np.ndarray:
    """``Hy  c  Hy``-style line on a small canvas; the anchors establish a
    realistic line band so the glyph's crop carries the same position/size
    cues it will have inside a real text line. Double spaces make the
    word-grouping unambiguous at every font size."""
    return render_page(f"{anchor}  {ch}  {anchor}",
                       width=14 * font_size, font_size=font_size,
                       margin=6, noise=0.0, font_family=font_family)


def _train_crop(ch: str, anchor: str, font_size: int,
                font_family: str = "default") -> Optional[np.ndarray]:
    """Clean crop of ``ch`` from an anchored line (None if segmentation
    can't isolate it — caller resamples). Noise is added AFTER cropping so
    training labels are never corrupted by mis-segmentation."""
    img = _render_train_line(ch, anchor, font_size, font_family)
    bands = segment_lines(img)
    if not bands:
        return None
    band = img[bands[0][0]: bands[0][1]]
    groups: List[List[Tuple[int, int]]] = []
    for x0, x1, sp in segment_glyphs(band):
        if sp or not groups:
            groups.append([])
        groups[-1].append((x0, x1))
    if len(groups) != 3:
        return None
    g = groups[1]
    return _crop_glyph(band, min(b[0] for b in g), max(b[1] for b in g))


# ---------------------------------------------------------------------------
# segmentation (host-side numpy: classic projection profiles)
# ---------------------------------------------------------------------------
def _ink(img: np.ndarray) -> np.ndarray:
    """Boolean ink mask from a grayscale page via Otsu's threshold.

    A percentile-midpoint threshold fails on SPARSE pages: with 2% ink
    the 2nd percentile is still background, the midpoint lands inside
    the noise band, and every noise speck reads as ink (measured: a
    2-line page on a 1024-wide canvas collapsed to one 98-row "line").
    Otsu maximizes between-class variance so the tiny ink class still
    wins; pages whose two classes sit closer than 40 gray levels have
    no real ink/background separation and read as blank."""
    arr = np.asarray(img, np.float32)
    hist, edges = np.histogram(arr, bins=64, range=(0.0, 255.0))
    p = hist.astype(np.float64) / max(hist.sum(), 1)
    centers = (edges[:-1] + edges[1:]) / 2.0
    w0 = np.cumsum(p)
    m = np.cumsum(p * centers)
    w1 = 1.0 - w0
    valid = (w0 > 1e-9) & (w1 > 1e-9)
    mu0 = m / np.maximum(w0, 1e-12)
    mu1 = (m[-1] - m) / np.maximum(w1, 1e-12)
    var = np.where(valid, w0 * w1 * (mu0 - mu1) ** 2, -1.0)
    k = int(np.argmax(var))
    if not valid[k] or mu1[k] - mu0[k] < 40.0:
        return np.zeros(arr.shape, bool)
    # class 0 = bins 0..k inclusive, so threshold at the bin's UPPER edge:
    # `arr < centers[k]` drops ink whose gray sits in the argmax bin above
    # its center (measured: TTF strokes at gray 11 vs bin-2 center 9.96 —
    # the whole glyph read as background and the crop went blank)
    return arr < edges[k + 1]


def segment_lines(img: np.ndarray, min_gap: int = 2) -> List[Tuple[int, int]]:
    """(y0, y1) text-line bands via the horizontal ink projection."""
    ink = _ink(img)
    rows = ink.any(axis=1)
    bands: List[Tuple[int, int]] = []
    start = None
    gap = 0
    for y, has in enumerate(rows):
        if has:
            if start is None:
                start = y
            gap = 0
        elif start is not None:
            gap += 1
            if gap >= min_gap:
                bands.append((start, y - gap + 1))
                start = None
    if start is not None:
        bands.append((start, len(rows)))
    return bands


def segment_glyphs(line_img: np.ndarray,
                   space_ratio: float = 0.45,
                   min_area: int = 2) -> List[Tuple[int, int, bool]]:
    """(x0, x1, preceded_by_space) glyph boxes via 8-connected components
    of the line's ink mask, with x-overlapping components merged into one
    glyph (the dot of i/j, the pieces of ':' ';' '=' '%' '!' '?').

    Projection-profile column segmentation is the classic alternative but
    fails both ways on real renders: the 1-px-thin joins inside 'u'/'m'
    read as gap columns (splitting one glyph into several), and kerned
    pairs that share no blank column weld together (measured: page
    round-trip 73% vs >99% with components). Components below
    ``min_area`` ink pixels are scan-noise specks and dropped. A gap
    wider than ``space_ratio`` x the line height reads as a word space."""
    from scipy import ndimage

    ink = _ink(line_img)
    labels, n = ndimage.label(ink, structure=np.ones((3, 3), int))
    if n == 0:
        return []
    areas = ndimage.sum_labels(ink, labels, index=np.arange(1, n + 1))
    boxes = sorted((sl[1].start, sl[1].stop)
                   for sl, a in zip(ndimage.find_objects(labels), areas)
                   if a >= min_area)
    if not boxes:
        return []
    # merge only on SUBSTANTIAL x-overlap (>=50% of the narrower box):
    # a dot sits fully inside its i/j stem's range, ':'/'='/'%' pieces
    # stack, but a ',' tucked under the previous digit's curve overlaps
    # it by only 1-2 px and must stay its own glyph
    merged: List[List[int]] = [list(boxes[0])]
    for x0, x1 in boxes[1:]:
        prev = merged[-1]
        overlap = min(prev[1], x1) - x0
        if overlap >= 0.5 * min(prev[1] - prev[0], x1 - x0):
            prev[1] = max(prev[1], x1)
        else:
            merged.append([x0, x1])
    height = line_img.shape[0]
    out: List[Tuple[int, int, bool]] = []
    # word-space threshold: adaptive to the line's own gap distribution
    # (letter gaps cluster at 1-2 px; word spaces are 2x+ that), with the
    # height-based formula as floor/fallback for short lines
    gaps = [b[0] - a[1] for a, b in zip(merged, merged[1:])
            if b[0] - a[1] > 0]
    space_w = max(2.5, space_ratio * height * 0.5)
    if len(gaps) >= 4:
        space_w = min(space_w, max(2.5, 2.2 * float(np.median(gaps))))
    prev_end = None
    for x0, x1 in merged:
        sp = prev_end is not None and (x0 - prev_end) >= space_w
        out.append((x0, x1, sp))
        prev_end = x1
    return out


def _crop_glyph(line_img: np.ndarray, x0: int, x1: int) -> np.ndarray:
    """Normalize one glyph to [GLYPH_H, GLYPH_W] f32 in [0, 1] (1 = ink).

    The crop keeps the FULL line band vertically (scaled by the line
    height, not the glyph's own bbox): a '.' must stay small and low and
    a quote small and high — bbox-stretching every glyph to fill the tile
    erases exactly the size/position cues that separate punctuation
    (measured: '.' ',' ':' all collapse to '#'-like blobs)."""
    from PIL import Image

    sub = line_img[:, x0:x1]
    ink = _ink(sub)
    xs = np.nonzero(ink.any(axis=0))[0]
    if len(xs) == 0:
        # Otsu is fragile on a few-px strip (tens of pixels, 2-3 gray
        # levels); any clearly-below-background pixel is ink for the
        # purpose of column trimming
        arr = np.asarray(sub, np.float32)
        xs = np.nonzero((arr < 250.0).any(axis=0))[0]
    if len(xs) == 0:
        return np.zeros((GLYPH_H, GLYPH_W), np.float32)
    sub = sub[:, xs.min(): xs.max() + 1]
    h, w = sub.shape
    scale = min((GLYPH_H - 2) / h, (GLYPH_W - 2) / w)
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    im = Image.fromarray(sub).resize((nw, nh), Image.BILINEAR)
    out = np.full((GLYPH_H, GLYPH_W), 255.0, np.float32)
    oy, ox = (GLYPH_H - nh) // 2, (GLYPH_W - nw) // 2
    out[oy: oy + nh, ox: ox + nw] = np.asarray(im, np.float32)
    return (255.0 - out) / 255.0


# ---------------------------------------------------------------------------
# recognizer (Flax conv net; one jitted batched forward per page)
# ---------------------------------------------------------------------------
def _build_module(num_classes: int):
    from flax import linen as nn

    class GlyphNet(nn.Module):
        @nn.compact
        def __call__(self, x):            # [N, H, W] in [0, 1]
            x = x[..., None]
            x = nn.Conv(16, (3, 3))(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(32, (3, 3))(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = x.reshape(x.shape[0], -1)
            x = nn.relu(nn.Dense(128)(x))
            return nn.Dense(num_classes)(x)

    return GlyphNet()


@dataclass
class OCRModel:
    module: object
    params: object
    tokens: List[str]   # class index -> emitted text (1+ chars)

    _jit_logits: Optional[object] = None

    def classify(self, crops: np.ndarray) -> List[str]:
        return self.classify_conf(crops)[0]

    def classify_conf(self, crops: np.ndarray
                      ) -> Tuple[List[str], np.ndarray]:
        """Glyph crops [N, GLYPH_H, GLYPH_W] -> (characters, softmax
        confidence), padded to a power-of-two batch bucket so page-size
        variation doesn't recompile."""
        import jax
        import jax.numpy as jnp

        if self._jit_logits is None:
            self._jit_logits = jax.jit(self.module.apply)
        n = crops.shape[0]
        if n == 0:
            return [], np.zeros((0,), np.float32)
        bucket = 1 << max(4, (n - 1).bit_length())
        batch = np.zeros((bucket, GLYPH_H, GLYPH_W), np.float32)
        batch[:n] = crops
        logits = self._jit_logits(self.params, jnp.asarray(batch))
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))[:n]
        idx = probs.argmax(axis=-1)
        return ([self.tokens[i] for i in idx],
                probs[np.arange(n), idx].astype(np.float32))

    # -- persistence (npz + charset json; orbax is overkill for ~100k
    #    params and this stays dependency-light for the CLI) -------------
    def save(self, path: str) -> None:
        import jax

        os.makedirs(path, exist_ok=True)
        leaves, treedef = jax.tree.flatten(self.params)
        np.savez(os.path.join(path, "params.npz"),
                 *[np.asarray(l) for l in leaves])
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"tokens": self.tokens}, f)

    @classmethod
    def load(cls, path: str) -> "OCRModel":
        import jax

        with open(os.path.join(path, "meta.json")) as f:
            tokens = list(json.load(f)["tokens"])
        module = _build_module(len(tokens))
        import jax.numpy as jnp

        ref = module.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, GLYPH_H, GLYPH_W)))
        leaves, treedef = jax.tree.flatten(ref)
        data = np.load(os.path.join(path, "params.npz"))
        loaded = [data[f"arr_{i}"] for i in range(len(leaves))]
        return cls(module=module,
                   params=jax.tree.unflatten(treedef, loaded),
                   tokens=tokens)


def train_ocr(charset: str = CHARSET, steps: int = 400, batch: int = 256,
              font_sizes: Sequence[int] = (14, 16, 18, 20),
              noise: float = 0.04, learning_rate: float = 2e-3,
              seed: int = 0,
              weld_tokens: Sequence[str] = WELD_TOKENS,
              fonts: Sequence[str] = ("default",),
              rotate_deg: float = 0.0) -> OCRModel:
    """Train the glyph recognizer on synthetically rendered characters
    plus the welded-pair composite classes (randomized size / sub-pixel
    placement / gaussian noise), crops extracted by the SAME segmentation
    used at inference so train and serve distributions match.

    ``fonts`` samples training renders uniformly across font families
    (see FONT_FAMILIES / available_fonts) so one classifier covers them
    all; ``rotate_deg`` adds uniform +-deg rotation jitter to each crop
    (scanned pages are rarely perfectly deskewed)."""
    import jax
    import jax.numpy as jnp
    import optax

    tokens = list(charset) + [t for t in weld_tokens
                              if all(c in charset for c in t)]
    rng = np.random.default_rng(seed)
    module = _build_module(len(tokens))
    params = module.init(jax.random.PRNGKey(seed),
                         jnp.zeros((1, GLYPH_H, GLYPH_W)))
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, x, y):
        def loss_fn(p):
            logits = module.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    # clean crops are deterministic per (char, anchor, size): render once,
    # augment with noise per sample
    crop_cache: dict = {}

    def sample() -> Tuple[np.ndarray, np.ndarray]:
        xs = np.zeros((batch, GLYPH_H, GLYPH_W), np.float32)
        ys = np.zeros((batch,), np.int32)
        for i in range(batch):
            crop = None
            while crop is None:   # resample if segmentation rejected one
                ci = int(rng.integers(len(tokens)))
                key = (ci, int(rng.integers(len(_ANCHORS))),
                       int(rng.choice(font_sizes)),
                       fonts[int(rng.integers(len(fonts)))])
                if key not in crop_cache:
                    crop_cache[key] = _train_crop(tokens[ci],
                                                  _ANCHORS[key[1]],
                                                  key[2], key[3])
                crop = crop_cache[key]
            if rotate_deg > 0:
                from scipy import ndimage as _ndi

                deg = float(rng.uniform(-rotate_deg, rotate_deg))
                crop = np.clip(_ndi.rotate(crop, deg, reshape=False,
                                           order=1, cval=0.0), 0, 1)
            # +-1 px placement jitter: inference bands shift with each
            # line's ascender/descender mix; train crops must cover it
            dy, dx = rng.integers(-1, 2, size=2)
            crop = np.roll(np.roll(crop, dy, axis=0), dx, axis=1)
            if noise > 0:
                # sigma sampled per crop in [0, noise]: a model trained at
                # one fixed sigma misreads CLEAN pages of thin-stroke TTF
                # fonts (measured: dejavu-sans i->'|' at noise 0 but not
                # 0.04 — the clean render was out of distribution)
                sigma = float(rng.uniform(0.0, noise))
                if sigma > 0:
                    crop = np.clip(
                        crop + rng.normal(0, sigma, crop.shape), 0, 1)
            xs[i] = crop
            ys[i] = ci
        return xs, ys

    loss = None
    for _ in range(steps):
        x, y = sample()
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(x), jnp.asarray(y))
    model = OCRModel(module=module, params=params, tokens=tokens)
    model.final_loss = float(loss)   # type: ignore[attr-defined]
    return model


# ---------------------------------------------------------------------------
# page OCR
# ---------------------------------------------------------------------------
# split-pass gates: a box at least this fraction of the line height wide
# whose classification is below this confidence is re-tried as two glyphs
_SPLIT_MIN_W = 0.6
_SPLIT_CONF = 0.75
# boxes at least this fraction of the line height wide are retried even at
# high confidence: kerned TTF pairs weld into one component the classifier
# reads confidently as a single letter (measured: dejavu-sans 'rt' -> 'n',
# default 'Ex' -> '~'); legitimate wide glyphs (m/M/W) survive because the
# split halves must BEAT the whole box's confidence to win
_SPLIT_FORCE_W = 0.75


def _split_cuts(line_img: np.ndarray, x0: int, x1: int,
                max_cuts: int = 3) -> List[int]:
    """Candidate two-glyph cut columns for a box: the weakest interior
    ink columns (welded pairs like '3,' join through a 1-px anti-alias
    bridge), at most ``max_cuts`` of them pairwise >=3 px apart — a
    single argmin often lands inside the glyph body, so the classifier
    arbitrates between candidates by pair confidence."""
    if x1 - x0 < 6:
        return []
    counts = _ink(line_img[:, x0:x1]).sum(axis=0)
    interior = counts[3: x1 - x0 - 3]
    cuts: List[int] = []
    for off in np.argsort(interior, kind="stable"):
        c = x0 + 3 + int(off)
        if all(abs(c - o) >= 3 for o in cuts):
            cuts.append(c)
            if len(cuts) == max_cuts:
                break
    return cuts


def _spaces(boxes: List[Tuple[int, int]], chars: List[str],
            height: int) -> List[bool]:
    """preceded-by-space flags for one line's final glyph boxes.

    Geometry first — a gap clear of the line's own letter-gap level
    (median + 0.05 x height, floor 2.5) with a sane center distance —
    then char-identity rules for the cases geometry provably cannot
    separate on this font (measured: '8'-'.' inside "18.3" and the
    'r'-space-'y' of "prior year" have identical gap/center features):
    no space before punctuation, and digit-digit needs a wide gap
    (tabular figures give '1' huge sidebearings)."""
    n = len(boxes)
    out = [False] * n
    if n < 2:
        return out
    gaps = [boxes[i][0] - boxes[i - 1][1] for i in range(1, n)]
    pos = [g for g in gaps if g > 0]
    thr = max(2.5, (float(np.median(pos)) if pos else 0.0) + 0.05 * height)
    # proportional/mono TTF rendering spreads letter gaps to 2-3+ px while
    # word gaps sit at 2x+ that, so the median+0.05h formula alone inserts
    # intra-word spaces ("Qua rterly"). When the line's own gap histogram
    # is clearly bimodal (1D Otsu split with >= max(2, 0.12h) px between
    # the cluster means), threshold at the cluster midpoint instead; the
    # formula stays as the floor and the unimodal/short-line fallback.
    if len(pos) >= 3:
        xs = np.sort(np.asarray(pos, np.float64))
        best_var, best_thr = -1.0, None
        for s in range(1, len(xs)):
            lo, hi = xs[:s], xs[s:]
            if hi[0] - lo[-1] < 1.0:
                continue   # split inside one cluster
            w0, w1 = s / len(xs), 1.0 - s / len(xs)
            var = w0 * w1 * (hi.mean() - lo.mean()) ** 2
            if var > best_var:
                best_var = var
                best_thr = (lo[-1] + hi[0]) / 2.0
                sep = hi.mean() - lo.mean()
        if best_thr is not None and sep >= max(2.0, 0.12 * height):
            thr = max(thr, best_thr)
    for i in range(1, n):
        c2c = ((boxes[i][0] + boxes[i][1])
               - (boxes[i - 1][0] + boxes[i - 1][1])) / 2.0
        sp = gaps[i - 1] >= thr and c2c >= 0.55 * height
        # char-identity rules use token EDGES (a weld token like "3,"
        # contributes ',' on its left-neighbour side, '3' on its right)
        right0, leftn = chars[i][0], chars[i - 1][-1]
        if right0 in ".,;:!?)]}":
            sp = False
        elif len(chars[i - 1]) > 1 and right0.isdigit():
            sp = False  # weld "3," then a digit: thousands separator
        elif (right0.isdigit() and leftn in ".," and i >= 2
                and chars[i - 2][-1].isdigit()):
            sp = False  # digit-separator-digit: "4,211" / "18.3"
        elif right0.isdigit() and leftn.isdigit():
            sp = gaps[i - 1] >= 0.55 * height
        elif (leftn in ":;,!?" and right0.isalpha()
                and gaps[i - 1] >= 2):
            sp = True   # sentence punctuation before a letter
        elif (right0 in "([" and leftn.isalpha()
                and gaps[i - 1] >= 2):
            sp = True   # "year [restated]" — '(' '[' rarely follow a
            #             letter directly in body text (unlike "7(a)")
        out[i] = sp
    return out


def ocr_page(model: OCRModel, img: np.ndarray) -> str:
    """One page image -> text. Segmentation is host-side; the page's
    glyph crops are classified in one batched device forward, plus one
    batch per split round and one for the merge pass."""
    line_bands = segment_lines(img)
    line_imgs = [img[y0:y1] for y0, y1 in line_bands]
    entries: List[Tuple[int, int, int]] = []   # (line index, x0, x1)
    crops: List[np.ndarray] = []
    for li, line in enumerate(line_imgs):
        for x0, x1, _ in segment_glyphs(line):
            entries.append((li, x0, x1))
            crops.append(_crop_glyph(line, x0, x1))
    if not crops:
        return ""
    chars, conf = model.classify_conf(np.stack(crops))
    chars, conf = list(chars), list(conf)
    # id of the split that produced an entry (None = original component);
    # co-halves of one split are exempt from the merge pass, which would
    # otherwise just undo the split (the union crop IS the pre-split box)
    pair_id: List[Optional[int]] = [None] * len(entries)
    next_pair = 0

    # iterative split: wide low-confidence boxes are usually welded
    # glyphs; each round classifies every candidate cut's halves in one
    # batch and the best-confidence pair replaces the box if it wins.
    # Accepted halves RE-ENTER the next round — serif welds span 3+
    # glyphs ("illi" reads 'M', "gu" reads 'm') and a single two-way cut
    # cannot recover them; each round peels one glyph off the weld.
    for _round in range(3):
        cand: List[Tuple[int, int]] = []     # (entry index, cut column)
        retry: List[np.ndarray] = []
        for i, (li, x0, x1) in enumerate(entries):
            line = line_imgs[li]
            wide = x1 - x0 >= _SPLIT_FORCE_W * line.shape[0]
            if ((conf[i] < _SPLIT_CONF or wide)
                    and x1 - x0 >= _SPLIT_MIN_W * line.shape[0]):
                for cut in _split_cuts(line, x0, x1):
                    cand.append((i, cut))
                    retry.append(_crop_glyph(line, x0, cut))
                    retry.append(_crop_glyph(line, cut, x1))
        if not cand:
            break
        rchars, rconf = model.classify_conf(np.stack(retry))
        best: dict = {}
        for j, (i, cut) in enumerate(cand):
            pair_conf = (rconf[2 * j] + rconf[2 * j + 1]) / 2.0
            if pair_conf > max(conf[i], best.get(i, (0.0,))[0]):
                best[i] = (pair_conf, cut, rchars[2 * j],
                           rchars[2 * j + 1],
                           float(rconf[2 * j]), float(rconf[2 * j + 1]))
        if not best:
            break
        for i in sorted(best, reverse=True):   # reverse: indices stay valid
            _, cut, chl, chr_, cl, cr = best[i]
            li, x0, x1 = entries[i]
            entries[i: i + 1] = [(li, x0, cut), (li, cut, x1)]
            chars[i: i + 1] = [chl, chr_]
            conf[i: i + 1] = [cl, cr]
            pair_id[i: i + 1] = [next_pair, next_pair]
            next_pair += 1

    # merge pass (the split pass's dual): adjacent touching/overlapping
    # boxes whose x-overlap fell short of segment_glyphs' 50% merge rule
    # are usually ONE glyph the components cut in two — '%' sheds its left
    # circle (read as '1') from the slash+right-circle piece. Re-classify
    # the union crop; the merge wins only when it beats BOTH singles, so
    # kerned letter pairs that merely touch stay split.
    mcand: List[int] = []
    mcrops: List[np.ndarray] = []
    for i in range(len(entries) - 1):
        (li, x0, x1), (lj, y0_, y1_) = entries[i], entries[i + 1]
        co_halves = (pair_id[i] is not None
                     and pair_id[i] == pair_id[i + 1])
        if li == lj and y0_ - x1 <= 0 and not co_halves:
            mcand.append(i)
            mcrops.append(_crop_glyph(line_imgs[li], x0, y1_))
    if mcand:
        mchars, mconf = model.classify_conf(np.stack(mcrops))
        taken: set = set()
        accepted: List[Tuple[int, str, float]] = []
        for j, i in enumerate(mcand):
            if i in taken or i + 1 in taken:
                continue
            if mconf[j] > max(conf[i], conf[i + 1]):
                accepted.append((i, mchars[j], float(mconf[j])))
                taken.update((i, i + 1))
        for i, ch, cf in sorted(accepted, reverse=True):
            li, x0, _ = entries[i]
            x1 = entries[i + 1][2]
            entries[i: i + 2] = [(li, x0, x1)]
            chars[i: i + 2] = [ch]
            conf[i: i + 2] = [cf]
            pair_id[i: i + 2] = [None]

    out_lines: List[str] = []
    i = 0
    for li, line in enumerate(line_imgs):
        lboxes: List[Tuple[int, int]] = []
        lchars: List[str] = []
        while i < len(entries) and entries[i][0] == li:
            lboxes.append(entries[i][1:])
            lchars.append(chars[i])
            i += 1
        sps = _spaces(lboxes, lchars, line.shape[0])
        out_lines.append("".join((" " if sp else "") + ch
                                 for ch, sp in zip(lchars, sps)))
    return "\n".join(out_lines)


def ocr_pages_to_processed(model: OCRModel, images: Sequence[np.ndarray],
                           date_published: str, doc_name: str = "doc",
                           out_path: Optional[str] = None) -> List[dict]:
    """OCR a scanned document (one image per page) straight into the
    processed-JSON contract via the markdown chunker — the same rows
    `load_processed_dir` ingests (reference contract:
    /root/reference/src/load_data.py:58-78). Pages are joined with
    form-feeds so the chunker preserves the scan's page numbering."""
    from .chunker import preprocess_document

    text = "\f".join(ocr_page(model, img) for img in images)
    rows = preprocess_document(text, date_published, doc_name=doc_name)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rows, f)
    return rows


# ---------------------------------------------------------------------------
# per-font accuracy report (the OCR_r*.json artifact generator)
# ---------------------------------------------------------------------------
_REPORT_PAGE = "\n".join([
    "Quarterly Report 2024: net assets increased 18.3 percent",
    "interest-bearing deposits stand at $4,211 million (audited)",
    "trade payables decreased 7.5% since March 31, 2024.",
    "Management expects margin expansion of 120 bps; guidance holds.",
    "[Exhibit 9] cash & equivalents: $1,092,366 thousand",
])


def char_accuracy(ref: str, out: str) -> float:
    """Whitespace-insensitive character-level similarity ratio."""
    import difflib

    return difflib.SequenceMatcher(None, ref.replace("\n", ""),
                                   out.replace("\n", "")).ratio()


def accuracy_report(model: OCRModel, fonts: Sequence[str],
                    noises: Sequence[float] = (0.0, 0.04, 0.08),
                    font_sizes: Sequence[int] = (14, 16, 18),
                    page: str = _REPORT_PAGE, seed: int = 3) -> dict:
    """Round-trip character accuracy of ``model`` per font family x noise
    level over a finance-flavored fixture page, averaged across font
    sizes — the per-font evidence OCR_r04.json records."""
    report: dict = {}
    for family in fonts:
        by_noise = {}
        for nz in noises:
            accs = [char_accuracy(page, ocr_page(model, render_page(
                        page, font_size=fs, noise=nz, seed=seed,
                        font_family=family)))
                    for fs in font_sizes]
            by_noise[f"noise_{nz}"] = round(float(np.mean(accs)), 4)
        report[family] = by_noise
    return report
