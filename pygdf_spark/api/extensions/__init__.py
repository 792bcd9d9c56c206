"""cudf.api.extensions parity (reference api/extensions/accessor.py):
custom accessor registration — the real implementations live at the
package top level; this module mirrors the reference import path."""

from pygdf_spark import (  # noqa: F401
    register_dataframe_accessor,
    register_index_accessor,
    register_series_accessor,
)
