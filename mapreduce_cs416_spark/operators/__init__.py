from .mapreduce import run_mapreduce, mr_output_lines

__all__ = ["run_mapreduce", "mr_output_lines"]
