from .numeric import dsum, davg
from .taxi import dotnet_dayofweek, trip_speed_mph, finite

__all__ = ["dsum", "davg", "dotnet_dayofweek", "trip_speed_mph", "finite"]
