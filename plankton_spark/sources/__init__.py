"""Custom source implementations beyond the built-in file formats.

The built-in formats (parquet/csv/json/orc/text, §2.1) are exercised
in queries/scans.py and queries/sources_extra.py; this package holds
sources that require Spark's extension APIs — currently the Spark 4
Python DataSource (pyds.py).
"""
