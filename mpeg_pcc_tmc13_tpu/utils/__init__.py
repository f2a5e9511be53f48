"""L0 utilities: Morton codes, PLY I/O, config system, timing, colourspace."""
