"""Host-side image IO + EXIF.

Reference parity: image/image_io.cpp ReadImage (jpeg/png/tiff via vendored
C libs -> PIL here), image/image_converter.hpp Rgb2Gray (Rec.601 weights),
exif/exif_IO_EasyExif.hpp (EXIF model/focal extraction) and
exif/sensor_width_database/ParseDatabase.hpp (model -> sensor width mm,
"Model;width" semicolon format) used by main_SfMInit_ImageListing:
    focal_pixels = max(w, h) * focal_mm / sensor_width_mm
"""

import os
from typing import Optional, Tuple

import numpy as np


def read_image(path, grayscale=False):
    from PIL import Image

    im = Image.open(path)
    if grayscale:
        # match Rgb2Gray: 0.299 R + 0.587 G + 0.114 B (PIL "L" uses the same)
        im = im.convert("L")
        return np.asarray(im, np.float32) / 255.0
    im = im.convert("RGB")
    return np.asarray(im, np.uint8)


def write_image(path, array):
    from PIL import Image

    a = np.asarray(array)
    if a.dtype != np.uint8:
        a = np.clip(a * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(a).save(path)


def read_exif(path) -> dict:
    """Returns {model, make, focal_mm, width, height, gps} (keys best-effort)."""
    from PIL import Image, ExifTags

    out = {}
    with Image.open(path) as im:
        out["width"], out["height"] = im.size
        try:
            exif = im.getexif()
        except Exception:
            return out
        if not exif:
            return out
        tags = {ExifTags.TAGS.get(k, k): v for k, v in exif.items()}
        out["model"] = str(tags.get("Model", "")).strip()
        out["make"] = str(tags.get("Make", "")).strip()
        focal = tags.get("FocalLength")
        if focal is not None:
            try:
                out["focal_mm"] = float(focal)
            except (TypeError, ValueError):
                pass
        try:
            gps_ifd = exif.get_ifd(ExifTags.IFD.GPSInfo)
            if gps_ifd:
                out["gps"] = _parse_gps(gps_ifd)
        except Exception:
            pass
    return out


def _parse_gps(ifd):
    def dms(v, ref, neg):
        d = float(v[0]) + float(v[1]) / 60.0 + float(v[2]) / 3600.0
        return -d if ref in neg else d

    try:
        lat = dms(ifd[2], str(ifd.get(1, "N")), ("S",))
        lon = dms(ifd[4], str(ifd.get(3, "E")), ("W",))
        alt = float(ifd.get(6, 0.0))
        return dict(lat=lat, lon=lon, alt=alt)
    except Exception:
        return None


# Minimal built-in sensor-width DB (mm). The openMVG-format file
# ("Model;width" per line, sensor_width_camera_database.txt) can be loaded
# with load_sensor_database(path) for full coverage.
_BUILTIN_SENSOR_DB = {
    "canon eos 5d mark ii": 36.0,
    "canon eos 5d": 35.8,
    "canon eos 1100d": 22.2,
    "nikon d90": 23.6,
    "nikon d3200": 23.2,
    "sony ilce-7m3": 35.6,
    "iphone 12": 5.78,
    "iphone 13": 7.01,
    "dji fc330": 6.24,
    "kodak z612": 5.75,  # the SceauxCastle sample camera
}


def load_sensor_database(path: Optional[str] = None) -> dict:
    db = dict(_BUILTIN_SENSOR_DB)
    if path and os.path.exists(path):
        with open(path, errors="ignore") as f:
            for line in f:
                parts = line.strip().split(";")
                if len(parts) >= 2:
                    try:
                        db[parts[0].strip().lower()] = float(parts[1])
                    except ValueError:
                        continue
    return db


def focal_from_exif(exif: dict, db: dict) -> Optional[float]:
    """focal_pixels = max(w,h) * focal_mm / sensor_width_mm
    (main_SfMInit_ImageListing.cpp)."""
    model = str(exif.get("model", "")).lower()
    focal_mm = exif.get("focal_mm")
    if not model or not focal_mm:
        return None
    width_mm = db.get(model)
    if width_mm is None:
        # try "make model"
        width_mm = db.get((str(exif.get("make", "")).lower() + " " + model).strip())
    if width_mm is None:
        return None
    return max(exif["width"], exif["height"]) * focal_mm / width_mm
