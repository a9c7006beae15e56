"""Model families built on aule-tpu attention (Llama-style flagship)."""
