from .direct import (ddpm_ancestral, ddim, ode_euler, sde_euler, ode_heun,
                     flow_euler)
from .pc import (get_pc_sampler, get_ode_sampler, get_predictor,
                 get_corrector, register_predictor, register_corrector)
from .controllable import get_pc_inpainter, get_pc_colorizer
from .rk45 import rk45_integrate
from .dpm_solver import NoiseScheduleVP, DPMSolver, model_wrapper
from . import deis

__all__ = ["ddpm_ancestral", "ddim", "ode_euler", "sde_euler", "ode_heun",
           "flow_euler", "get_pc_sampler", "get_ode_sampler",
           "get_predictor", "get_corrector", "register_predictor",
           "register_corrector", "get_pc_inpainter", "get_pc_colorizer",
           "rk45_integrate", "NoiseScheduleVP", "DPMSolver", "model_wrapper",
           "deis"]
