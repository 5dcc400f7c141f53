"""TPU-native re-implementation of the reference's finance-ML side project.

The reference carries a TensorFlow/Keras LSTM cross-asset return-forecasting
pipeline (``Cholesky_chameleon_VM/z/`` — SURVEY §1 L6 / §2c): data download →
TA-Lib feature engineering → windowing → LSTM train/eval. Rebuilt here on
JAX/flax/optax so the whole reference repo's capability surface exists in one
TPU-native framework:

- :mod:`dla_tpu.models.rawdata`    ↔ ``z/rawdata.py`` (OHLCV TSV reader)
- :mod:`dla_tpu.models.synthetic`  ↔ ``z/generate_dataset.py`` (dataset
  producer; synthetic seeded GBM instead of yfinance — this environment has
  zero egress, and the capability is the TSV corpus + universe metadata)
- :mod:`dla_tpu.models.indicators` ↔ ``z/chart.py`` (ROCP/MACD/RSI/BOLL/
  MA/VMA/PRICE_VOLUME/CROSS_PRICE — numpy, no TA-Lib; plus the
  weighted-decay future-return label and panel align/merge)
- :mod:`dla_tpu.models.features`   ↔ ``z/feature.py`` (union-of-dates
  alignment + ffill, sliding windows, train-only per-asset z-score,
  two-file feature dump)
- :mod:`dla_tpu.models.windpuller` ↔ ``z/windpuller.py`` (GaussianNoise →
  stacked LSTM → tanh head; risk_estimation loss; directional-accuracy and
  Pearson metrics)
- :mod:`dla_tpu.models.dataset`    ↔ ``z/dataset.py`` (epoch-shuffled
  batcher) and ``z/audit_overlaps.py`` (date-range overlap audit)
- :mod:`dla_tpu.models.renorm`     ↔ ``z/renormalization.py`` (Batch
  Renormalization) and ``z/relu_activation.py`` (BiReLU)
- :mod:`dla_tpu.models.cli`        ↔ ``z/gossip2.py`` (train/eval/predict
  subcommands, checkpoint-on-best-val, cumulative-return export)
"""

from dla_tpu.models.windpuller import WindPuller  # noqa: F401
