from .tables import load_table, load_tables, TABLES  # noqa: F401
