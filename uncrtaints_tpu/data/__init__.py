"""Dataset / input pipeline layer (L1).

- :mod:`preprocess`  -- radiometry rescaling (process_MS / process_SAR)
- :mod:`masks`       -- on-device cloud & shadow detection
- :mod:`samplers`    -- fixed / fixedsubset / random time-point samplers
- :mod:`sen12mscrts` -- SEN12MS-CR-TS multi-temporal dataset
- :mod:`sen12mscr`   -- SEN12MS-CR mono-temporal dataset
- :mod:`synthetic`   -- synthetic source with the same sample structure
  (tests / benches / smoke runs without the 600GB dataset)
- :mod:`pipeline`    -- host-side batching, shuffling, prefetch & per-host
  sharding (the DataLoader-worker replacement)
"""
