from .model import Model, Project
from .runner import run_project

__all__ = ["Model", "Project", "run_project"]
