"""Export sinks (KGX TSV, N-Triples) — see kgx.py."""
