"""Table-format layer. Import submodules directly (catalog, table, metadata,
reader, writer, transforms, meta_tables) — kept lazy here to avoid import
cycles with the planning layer."""
