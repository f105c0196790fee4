from vasp_tpu.bcs.waveforms import (  # noqa: F401
    CosineRamp,
    FourierFlowWaveform,
    InterfacePressure,
    ParabolicInflow,
    PatientWaveform,
    WomersleyInflow,
)
