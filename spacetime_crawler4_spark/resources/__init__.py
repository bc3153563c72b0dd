"""Data resources (stopwords, contractions, trained codebook).

This __init__ exists so the directory is a REGULAR package, not a
namespace package: ``importlib.resources.files()`` on a namespace
package inside a ``--py-files`` zip raises
``NotADirectoryError: MultiplexedPath only supports directories`` —
found by tests/test_spark_submit.py's end-to-end submit.
"""
