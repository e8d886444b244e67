"""Source-side utilities: multimodal binary columns, streaming request
sources (see ``..streaming``), and format loaders (``..tables``)."""
