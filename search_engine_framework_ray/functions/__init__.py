"""Pure, deterministic kernels shared by build and query: analysis chain,
Porter stemmer, varbyte postings codec, scoring formulas, text statistics,
hashing/sketching. No Ray dependencies — safe to import on any worker."""
