from .nt import parse_nt_lines, read_nt, triple_to_obj_py  # noqa: F401
