"""User-facing pipeline layer mirroring the reference's ``src/pipeline``."""
