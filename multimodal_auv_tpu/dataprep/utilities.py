"""Misc dataprep helpers — parity with
/root/reference/src/Multimodal_AUV/data_preparation/utilities.py:5-85."""
from __future__ import annotations

import logging
import os

import pandas as pd

logger = logging.getLogger(__name__)

# the reference accepts exactly .tif/.tiff (utilities.py:7) — no .gtiff,
# which would classify files the reference pipeline skips
_GEOTIFF_SUFFIXES = (".tif", ".tiff")


def is_geotiff(file: str) -> bool:
    return file.lower().endswith(_GEOTIFF_SUFFIXES)


def filter_csv_by_image_names(csv_file_path: str,
                              image_folder_path: str) -> pd.DataFrame:
    """Keep only coords.csv rows whose Image_Name exists in the folder.

    Degrades like the reference (utilities.py:21-35): a missing/unreadable
    CSV returns an EMPTY DataFrame, a missing image folder filters against
    an empty name set — pipelines continue instead of crashing mid-ETL."""
    try:
        df = pd.read_csv(csv_file_path)
    except FileNotFoundError:
        logger.error("CSV file not found at %s", csv_file_path)
        return pd.DataFrame()
    except Exception as e:
        logger.error("Error loading CSV %s: %s", csv_file_path, e)
        return pd.DataFrame()
    if os.path.exists(image_folder_path):
        names = set(os.listdir(image_folder_path))
    else:
        logger.warning("Image folder not found at %s — no rows will match",
                       image_folder_path)
        names = set()
    if "Image_Name" not in df.columns:
        # reference utilities.py:37-43: no Image_Name column -> return the
        # frame UNFILTERED (with an error log), not a KeyError
        logger.error("'Image_Name' column not found in CSV %s — returning "
                     "unfiltered rows", csv_file_path)
        return df
    out = df[df["Image_Name"].isin(names)].reset_index(drop=True)
    logger.info("Filtered %d -> %d rows by image presence", len(df), len(out))
    return out


def update_csv_path(csv_file_path: str, old_prefix: str, new_prefix: str):
    """Rewrite the 'path' column prefix in place (drive/mount moves).

    Degrades like the reference (utilities.py:46-90): missing file or
    missing 'path' column logs an error and leaves the file untouched.
    Returns the rewritten DataFrame on success, None on error (the
    reference returns None always; callers in both stacks ignore it)."""
    try:
        df = pd.read_csv(csv_file_path)
    except FileNotFoundError:
        logger.error("CSV file '%s' not found.", csv_file_path)
        return None
    if "path" not in df.columns:
        logger.error("'path' column not found in CSV header of %s",
                     csv_file_path)
        return None
    df["path"] = df["path"].astype(str).str.replace(old_prefix, new_prefix,
                                                    regex=False)
    df.to_csv(csv_file_path, index=False)
    logger.info("CSV file '%s' updated successfully.", csv_file_path)
    return df
