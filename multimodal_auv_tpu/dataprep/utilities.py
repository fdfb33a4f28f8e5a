"""Misc dataprep helpers — parity with
/root/reference/src/Multimodal_AUV/data_preparation/utilities.py:5-85."""
from __future__ import annotations

import logging
import os

import pandas as pd

logger = logging.getLogger(__name__)

_GEOTIFF_SUFFIXES = (".tif", ".tiff", ".gtiff")


def is_geotiff(file: str) -> bool:
    return file.lower().endswith(_GEOTIFF_SUFFIXES)


def filter_csv_by_image_names(csv_file_path: str,
                              image_folder_path: str) -> pd.DataFrame:
    """Keep only coords.csv rows whose Image_Name exists in the folder."""
    df = pd.read_csv(csv_file_path)
    names = set(os.listdir(image_folder_path))
    out = df[df["Image_Name"].isin(names)].reset_index(drop=True)
    logger.info("Filtered %d -> %d rows by image presence", len(df), len(out))
    return out


def update_csv_path(csv_file_path: str, old_prefix: str, new_prefix: str) -> pd.DataFrame:
    """Rewrite the 'path' column prefix (drive/mount moves)."""
    df = pd.read_csv(csv_file_path)
    df["path"] = df["path"].astype(str).str.replace(old_prefix, new_prefix,
                                                    regex=False)
    df.to_csv(csv_file_path, index=False)
    return df
