from .loggers import CSVLogger, TensorBoardLogger, SWIN_CSV_COLUMNS, HAT_CSV_COLUMNS
from .preview import save_tris_preview, to_u8

__all__ = [
    "CSVLogger",
    "TensorBoardLogger",
    "SWIN_CSV_COLUMNS",
    "HAT_CSV_COLUMNS",
    "save_tris_preview",
    "to_u8",
]
