"""Engine operators: seen-set dedup, politeness scheduling, fetch, validate,
training-data dedup/similarity — all DataFrame-in / DataFrame-out."""
