"""Services: orchestration of preprocess -> personalize -> synthesize pipelines.

Public surface parity with `iPERCore/services/`: run_imitator / run_swapper /
run_viewer / preprocess / personalize / train, plus the TOML config system and
the `path?=...,name?=...` input mini-language.
"""
