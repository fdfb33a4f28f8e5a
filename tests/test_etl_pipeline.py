"""End-to-end run_auv_preprocessing test: synthetic GAVIA JPEGs (telemetry
in the JPEG COM segment) + synthetic GeoTIFFs -> per-sample folders.

The reference has no tests for its ETL at all (SURVEY.md §4)."""
import os

import numpy as np
import pytest
from PIL import Image

from multimodal_auv_tpu.dataprep.exif import parse_telemetry, read_jpeg_comment
from multimodal_auv_tpu.dataprep.geodesy import latlon_to_utm
from multimodal_auv_tpu.dataprep.geotiff import write_geotiff
from multimodal_auv_tpu.pipelines.preprocessing import run_auv_preprocessing

# ~55.5N, 5.5W (west Scotland-ish): GAVIA ddmm.mmm format with hemisphere
_COMMENT = ("<telemetry><lat>5530.000N</lat><lon>00530.000W</lon>"
            "<altitude>2.5</altitude><depth>30.0</depth>"
            "<heading>180.0</heading><pitch>1.0</pitch><roll>0.5</roll>"
            "<surge>0.1</surge><sway>0.2</sway></telemetry>")


def _make_raw_tree(root, n=3):
    folder = os.path.join(root, "dive1")
    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(40, 90, size=(64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(folder, f"frame_{i:04d}.jpg"),
                                  comment=_COMMENT.encode())
    return root


def test_comment_roundtrip_and_parse(tmp_path):
    root = _make_raw_tree(str(tmp_path / "raw"), n=1)
    p = os.path.join(root, "dive1", "frame_0000.jpg")
    com = read_jpeg_comment(p)
    assert com and "<lat>" in com
    t = parse_telemetry(com)
    assert t["lat"] == pytest.approx(55.5)
    assert t["lon"] == pytest.approx(-5.5)
    assert t["depth"] == 30.0 and t["sway"] == 0.2


def test_full_preprocessing_pipeline(tmp_path):
    raw = _make_raw_tree(str(tmp_path / "raw"))
    # rasters centered at the UTM position of (55.5, -5.5)
    e, n, zone, _ = latlon_to_utm(55.5, -5.5)
    gdir = str(tmp_path / "tiffs")
    os.makedirs(gdir)
    h = w = 200  # 200 px * 0.5 m = 100 m centred on the dive position
    tr = (e - 50.0, 0.5, 0.0, n + 50.0, 0.0, -0.5)
    bathy = np.stack([np.full((h, w), 120, np.uint8),
                      np.full((h, w), 60, np.uint8)], axis=-1)
    write_geotiff(os.path.join(gdir, "site_a_b_Bathy.tif"), bathy, tr)
    sss = (np.random.default_rng(1).integers(0, 255, (h, w))
           .astype(np.uint8))
    write_geotiff(os.path.join(gdir, "site_a_b_SSS.tif"), sss, tr)

    out = str(tmp_path / "out")
    samples = run_auv_preprocessing(
        raw_optical_images_folder=raw,
        geotiff_folder=gdir,
        output_folder=out,
        window_size_meters=20.0,
        image_enhancement_method="AverageSubtraction",
    )

    # coords.csv exists with the reference columns
    import pandas as pd

    coords = pd.read_csv(os.path.join(out, "processed_optical", "coords.csv"))
    assert list(coords.columns) == [
        "Image_Name", "path", "easting", "northing", "altitude", "depth",
        "heading", "lat", "lon", "pitch", "roll", "surge", "sway", "label"]
    assert len(coords) == 3
    assert coords["easting"].iloc[0] == pytest.approx(e, abs=1.0)
    assert coords["depth"].iloc[0] == -30.0  # negated for display

    # per-sample folders with the full artifact contract
    dirs = sorted(os.listdir(samples))
    assert dirs == ["frame_0000", "frame_0001", "frame_0002"]
    d0 = os.path.join(samples, "frame_0000")
    files = set(os.listdir(d0))
    assert "frame_0000.jpg" in files
    assert "row_data.csv" in files
    assert "unlabelled.txt" in files
    assert {"output_channel_1.png", "output_channel_2.png"} <= files
    assert "grid_a_b_SSS.png" in files
    assert "combined_channels.png" in files  # step 4

    # patch geometry: 20 m / 0.5 m/px = 40 px
    patch = np.asarray(Image.open(os.path.join(d0, "output_channel_1.png")))
    assert patch.shape == (40, 40)
    assert (patch == 120).all()
    combined = np.asarray(Image.open(os.path.join(d0, "combined_channels.png")))
    assert combined.shape == (40, 40, 3)
    # cv2 writes BGR: R-plane (ch1=120) lands in index 2, G (ch2=60) in 1
    assert set(np.unique(combined[:, :, 1])) == {60}
    assert (combined[:, :, 2] == 120).all() or (combined[:, :, 0] == 120).all()

    # enhancement: processed optical differs from raw (average-subtracted)
    proc = np.asarray(Image.open(
        os.path.join(out, "processed_optical", "frame_0000.jpg")))
    raw0 = np.asarray(Image.open(os.path.join(raw, "dive1", "frame_0000.jpg")))
    assert proc.shape == raw0.shape
    assert float(np.abs(proc.astype(int) - raw0.astype(int)).mean()) > 1.0
    # folder average saved
    assert os.path.exists(os.path.join(out, "processed_optical",
                                       "dive1_Average.png"))


def test_row_data_excludes_image_name_and_path(tmp_path):
    raw = _make_raw_tree(str(tmp_path / "raw"), n=1)
    gdir = str(tmp_path / "tiffs")
    os.makedirs(gdir)
    out = str(tmp_path / "out")
    samples = run_auv_preprocessing(
        raw_optical_images_folder=raw, geotiff_folder=gdir,
        output_folder=out, skip_bathy_combine=True)
    row = open(os.path.join(samples, "frame_0000", "row_data.csv")).read()
    header = row.split("\n")[0].split(",")
    assert "Image_Name" not in header and "path" not in header
    assert "easting" in header and "label" in header
