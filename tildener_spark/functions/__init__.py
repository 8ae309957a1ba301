from tildener_spark.functions.text import extract_text, extract_text_py  # noqa: F401
