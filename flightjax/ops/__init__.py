from flightjax.ops import quaternions
from flightjax.ops import attitude
from flightjax.ops import geodesy
from flightjax.ops import interp
