"""Long-running face-swap inference serving (engine + HTTP server).

The reference has no serving layer — inference is a per-frame script loop
(`/root/reference/d3f/script_tools/put_video_through_fake_model.py`,
SURVEY.md §2 #15, §3.4). This subsystem is the production-deployment
equivalent the SURVEY's "aux subsystems" analysis calls for: a persistent
process that compiles the swap pipeline once and serves requests at device
batch rates.
"""

from denoising_diffusion_deep_fake_tpu.serving.engine import (  # noqa: F401
    EngineOverloadedError,
    EngineStats,
    RequestExpiredError,
    SwapEngine,
)
