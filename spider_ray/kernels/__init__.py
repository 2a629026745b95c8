"""Pure, deterministic kernels shared by the Ray pipelines and the
single-process oracle. No Ray imports here — everything is a pure function
over numpy / pyarrow / polars values so both sides compute bit-identical
results (the parity strategy from SURVEY.md §5/§7.4)."""
