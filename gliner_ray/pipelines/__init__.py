from .kg import build_kg, extract_mentions  # noqa: F401
