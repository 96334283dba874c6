"""Local real-image corpus builder.

The reference's acceptance gate runs every qoiformat.org test image
byte-for-byte against the upstream oracle (reference:
test/source/simple_test.cpp:332-362, fetch script test/fetch_test_images.sh:9).
This environment has no network, so the suite cannot be fetched; this module
assembles the closest local equivalent: real photographic / screenshot /
icon-with-alpha / texture images that ship inside locally-installed packages,
mirroring the qoiformat.org classes (photo_kodak, screenshot_web, icon_512,
textures_*, pngimg alpha cutouts).

Images are decoded with PIL, encoded to .qoi with the native oracle (the
golden-tested qoi.h analog), and cached under tests/resources/local_corpus/.
The builder is deterministic (fixed file list); hosts lacking the assets
degrade gracefully (reference behavior: simple_test.cpp:326-330 skips when
the corpus is absent).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
CORPUS_DIR = HERE / "resources" / "local_corpus"

_SP = "/opt/venv/lib/python3.12/site-packages"
_ADW = "/usr/share/icons/Adwaita/512x512"

# (name, source path, class, forced mode or None)
SOURCES = [
    # photo_kodak / photo_wikipedia analogs (real photographs)
    ("photo_hopper", f"{_SP}/matplotlib/mpl-data/sample_data/grace_hopper.jpg",
     "photo", "RGB"),
    ("photo_china", f"{_SP}/sklearn/datasets/images/china.jpg", "photo", "RGB"),
    ("photo_flower", f"{_SP}/sklearn/datasets/images/flower.jpg", "photo", "RGB"),
    ("photo_camera", f"{_SP}/pygame/docs/generated/_images/camera_rgb.jpg",
     "photo", "RGB"),
    # screenshot_web analog (real web screenshot, large)
    ("screenshot_requests",
     "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/requests/ext/ss.png",
     "screenshot", "RGBA"),
    # icon_512 / pngimg analogs (real alpha-varying icons)
    ("icon_image", f"{_ADW}/mimetypes/image-x-generic.png", "icon", "RGBA"),
    ("icon_camera", f"{_ADW}/devices/camera-web.png", "icon", "RGBA"),
    ("icon_gaming", f"{_ADW}/devices/input-gaming.png", "icon", "RGBA"),
    ("icon_disk", f"{_ADW}/devices/drive-harddisk.png", "icon", "RGBA"),
    ("icon_audio", f"{_ADW}/devices/audio-headphones.png", "icon", "RGBA"),
    ("icon_doc", f"{_ADW}/mimetypes/x-office-document.png", "icon", "RGBA"),
    # textures_* analogs
    ("texture_wall_y", f"{_SP}/labmaze/assets/style_02/wall_yellow_d.png",
     "texture", None),
    ("texture_wall_g", f"{_SP}/labmaze/assets/style_02/wall_lgreen_d.png",
     "texture", None),
    ("texture_wall_p", f"{_SP}/labmaze/assets/style_02/wall_purple_d.png",
     "texture", None),
    ("texture_array", f"{_SP}/pygame/examples/data/arraydemo.bmp",
     "texture", "RGB"),
]


def _load(path: str, mode):
    from PIL import Image

    im = Image.open(path)
    if mode is None:
        mode = "RGBA" if im.mode in ("RGBA", "LA", "P") else "RGB"
    im = im.convert(mode)
    return np.asarray(im, dtype=np.uint8), mode


def available() -> bool:
    try:
        import PIL  # noqa: F401
    except Exception:
        return False
    return sum(Path(p).exists() for _, p, _, _ in SOURCES) >= 8


def build(force: bool = False):
    """Materialize the corpus; returns a list of
    (name, klass, raw bytes, Desc, qoi_path).  Cached on disk."""
    import qoipp_tpu as q
    from qoipp_tpu import oracle

    CORPUS_DIR.mkdir(parents=True, exist_ok=True)
    items = []
    for name, src, klass, mode in SOURCES:
        if not Path(src).exists():
            continue
        qoi_path = CORPUS_DIR / f"{name}.qoi"
        arr, mode = _load(src, mode)
        h, w, ch = arr.shape
        desc = q.Desc(w, h, q.Channels(ch))
        raw = arr.reshape(-1)
        if force or not qoi_path.exists():
            blob, complete = oracle.encode(raw, desc)
            assert complete
            qoi_path.write_bytes(blob.tobytes())
        items.append((name, klass, raw, desc, qoi_path))
    # photo_wikipedia-analog: a real photo resampled to 1080p (smooth
    # resampling gradients give the DIFF/LUMA-heavy op mix of large photos)
    src = Path(SOURCES[1][1])
    if src.exists():
        from PIL import Image

        name = "photo_china_1080p"
        qoi_path = CORPUS_DIR / f"{name}.qoi"
        im = Image.open(src).convert("RGB").resize((1920, 1080), Image.BICUBIC)
        arr = np.asarray(im, dtype=np.uint8)
        desc = q.Desc(1920, 1080, q.Channels.RGB)
        raw = arr.reshape(-1)
        if force or not qoi_path.exists():
            blob, complete = oracle.encode(raw, desc)
            assert complete
            qoi_path.write_bytes(blob.tobytes())
        items.append((name, "photo", raw, desc, qoi_path))
    return items


def patch_batch(side: int = 512, channels: int = 3, limit: int | None = None):
    """Uniform-geometry batch for the batched device pipelines: tile every
    corpus image into side x side patches (pad-replicating edges), giving a
    real-content batch with one shared Desc."""
    import qoipp_tpu as q

    patches = []
    for name, klass, raw, desc, _ in build():
        ch = int(desc.channels)
        arr = raw.reshape(desc.height, desc.width, ch)
        if ch != channels:
            if channels == 3:
                arr = arr[:, :, :3]
            else:
                a = np.full(arr.shape[:2] + (1,), 255, np.uint8)
                arr = np.concatenate([arr, a], axis=2)
        ph = -(-arr.shape[0] // side) * side
        pw = -(-arr.shape[1] // side) * side
        arr = np.pad(arr, ((0, ph - arr.shape[0]), (0, pw - arr.shape[1]),
                           (0, 0)), mode="edge")
        for y in range(0, ph, side):
            for x in range(0, pw, side):
                patches.append(arr[y:y + side, x:x + side].reshape(-1))
    if limit is not None:
        patches = patches[:limit]
    desc = q.Desc(side, side, q.Channels(channels))
    return desc, patches
