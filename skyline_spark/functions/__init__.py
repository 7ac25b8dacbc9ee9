from .extract import extract_text, extract_text_expr  # noqa: F401
