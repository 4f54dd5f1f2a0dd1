"""The study's 14 stage workflows (reference ``src/*_workflow.py``).

Canonical run order (reference README.md:95-126):

1.  experiment_workflow                      — acquisition + phase machine
2.  otb4_import_workflow                     — OTB4 → CSV/NPY export
3.  data_integration_workflow               — log enrichment + amendments
4.  time_alignment_validation_workflow      — clock drift + muscle identity
5.  preprocessing_workflow                  — per-subject preprocessing
6.  subject_feature_extraction_workflow     — PSD + task-wise CMC + serial
7.  music_feature_extraction_workflow       — song lookup table
8.  statistics_data_preparation_workflow    — Combined Statistics frames
9.  descriptive_statistics_workflow         — cohort descriptives
10. statistics_RQ_A_omnibus_testing_workflow
11. statistics_RQ_A_post_hoc_testing_workflow (CBPA + heterogeneity)
12. statistics_RQ_A_mediation_analysis_workflow
13. statistics_RQ_B_omnibus_testing_workflow
14. statistics_report_workflow

Each module exposes its logic as functions (testable without hardware or
a full dataset) and doubles as a script via ``python -m
mba_tpu.workflows.<name>`` with module-level flags, mirroring the
reference's flag-at-top-of-script configuration style.
"""
from mba_tpu.workflows.paths import StudyPaths  # noqa: F401
