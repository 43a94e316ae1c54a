"""Console entry points: preprocess, compute-statistics, normalize, train,
decode, convert-checkpoint (+ module-run evaluate_mcd / evaluate_f0)."""
