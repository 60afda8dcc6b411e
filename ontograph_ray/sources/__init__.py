from .warc import read_warc, write_warc_file  # noqa: F401
