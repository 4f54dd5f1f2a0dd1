"""Real-time acquisition & experiment-control subsystem (host-side).

Parity target: reference ``src/pipeline/
measurements_and_interactive_visuals.py`` (2306 LoC) +
``src/experiment_workflow.py`` (759 LoC): the multiprocess sampling loop
feeding the shared state + triple-tier CSV saves, the dummy (no-hardware)
sampler, dynamometer calibration, the trial accuracy sampler, and the
event-driven experiment phase machine.  Interactive GUIs are replaced by a
headless controller API (the study's displays were matplotlib widgets; the
data paths and file formats are identical).
"""
from mba_tpu.acquisition.sampling import (  # noqa: F401
    read_serial_measurements, sampling_process, dummy_sampling_process,
    accuracy_sampler, dynamometer_volt_to_force, probe_serial_device,
)
from mba_tpu.acquisition.experiment import (  # noqa: F401
    start_experiment_processes, calibrate_mvc, ExperimentConfig,
)
