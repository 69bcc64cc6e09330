from .tables import load_table, load_tables, register_tables  # noqa: F401
