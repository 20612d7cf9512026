from .catalog import load_table, register_views
from .flights import flights, FLIGHTS_CTE

__all__ = ["load_table", "register_views", "flights", "FLIGHTS_CTE"]
