"""Data import/export: OTB4 archives, spectrogram persistence."""
from mba_tpu.io.otb4 import import_otb4_to_csv, read_otb4  # noqa: F401
