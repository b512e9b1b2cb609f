"""Column-level functions: text normalization/hashing, MinHash,
SimHash, vector math, fuzzy string ratios."""
