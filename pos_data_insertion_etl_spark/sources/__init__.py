from .zipsource import read_zip_fixed_width  # noqa: F401
