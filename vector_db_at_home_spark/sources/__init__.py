from .layout import zorder_code, zorder_write
from .tables import load_table, load_tables, register_views

__all__ = ["load_table", "load_tables", "register_views",
           "zorder_code", "zorder_write"]
