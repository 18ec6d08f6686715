"""fvcore.common.param_scheduler shim.

Schedulers are functions of ``where`` in [0, 1) — the fraction of
training done. Semantics per the call sites in the vendored
detectron2/solver/{build.py:253-292, lr_scheduler.py}: MultiStep over
explicit milestone values, Cosine start->end, Composite with rescaled
intervals (used by WarmupParamScheduler).
"""

import bisect
import math
from typing import List, Optional, Sequence, Union


class ParamScheduler:
    WHERE_EPSILON = 1e-6

    def __call__(self, where: float) -> float:
        raise NotImplementedError()


class ConstantParamScheduler(ParamScheduler):
    def __init__(self, value: float) -> None:
        self._value = value

    def __call__(self, where: float) -> float:
        if where >= 1.0:
            raise RuntimeError(f"where in ParamScheduler must be in [0, 1]: got {where}")
        return self._value


class LinearParamScheduler(ParamScheduler):
    def __init__(self, start_value: float, end_value: float) -> None:
        self._start_value = start_value
        self._end_value = end_value

    def __call__(self, where: float) -> float:
        return self._start_value + (self._end_value - self._start_value) * where


class CosineParamScheduler(ParamScheduler):
    def __init__(self, start_value: float, end_value: float) -> None:
        self._start_value = start_value
        self._end_value = end_value

    def __call__(self, where: float) -> float:
        return self._end_value + 0.5 * (self._start_value - self._end_value) * (
            1 + math.cos(math.pi * where)
        )


class ExponentialParamScheduler(ParamScheduler):
    def __init__(self, start_value: float, decay: float) -> None:
        self._start_value = start_value
        self._decay = decay

    def __call__(self, where: float) -> float:
        return self._start_value * (self._decay ** where)


class MultiStepParamScheduler(ParamScheduler):
    def __init__(
        self,
        values: List[float],
        num_updates: Optional[int] = None,
        milestones: Optional[List[int]] = None,
    ) -> None:
        if num_updates is None and milestones is None:
            raise ValueError("num_updates and milestones cannot both be None")
        if milestones is None:
            # uniform intervals
            num_updates = int(num_updates)
            milestones = [
                round(num_updates * (i + 1) / len(values))
                for i in range(len(values) - 1)
            ]
        if num_updates is None:
            num_updates = milestones[-1]
        if num_updates < len(values):
            raise ValueError("num_updates must be greater than length of param schedule")
        self._param_schedule = values
        self._num_updates = num_updates
        self._milestones = list(milestones)

    def __call__(self, where: float) -> float:
        if where > 1.0:
            raise RuntimeError(f"where in ParamScheduler must be in [0, 1]: got {where}")
        epoch_num = int((where + self.WHERE_EPSILON) * self._num_updates)
        return self._param_schedule[bisect.bisect_right(self._milestones, epoch_num)]


class CompositeParamScheduler(ParamScheduler):
    def __init__(
        self,
        schedulers: Sequence[ParamScheduler],
        lengths: List[float],
        interval_scaling: Sequence[str],
    ) -> None:
        if len(schedulers) != len(lengths):
            raise ValueError("Schedulers and lengths must be same length")
        if not math.isclose(sum(lengths), 1.0, rel_tol=1e-3):
            raise ValueError("The sum of all values in lengths must be 1")
        lengths = list(lengths)
        if sum(lengths) != 1.0:  # tolerate fp residue the way fvcore does
            lengths[-1] = 1.0 - sum(lengths[:-1])
        for s in interval_scaling:
            if s not in ("rescaled", "fixed"):
                raise ValueError(f"Unsupported interval_scaling: {s}")
        self._schedulers = list(schedulers)
        self._lengths = lengths
        self._interval_scaling = list(interval_scaling)

    def __call__(self, where: float) -> float:
        # find the interval `where` falls into
        interval = 0
        acc = 0.0
        for i, ln in enumerate(self._lengths):
            acc += ln
            if where + self.WHERE_EPSILON <= acc:
                interval = i
                break
        else:
            interval = len(self._lengths) - 1
            acc = 1.0
        start = acc - self._lengths[interval]
        if self._interval_scaling[interval] == "rescaled":
            where = (where - start) / self._lengths[interval]
        return self._schedulers[interval](min(where, 1.0 - self.WHERE_EPSILON))


class StepParamScheduler(ParamScheduler):
    def __init__(self, num_updates: Union[int, float], values: List[float]) -> None:
        self._values = values

    def __call__(self, where: float) -> float:
        ind = int((where + self.WHERE_EPSILON) * len(self._values))
        return self._values[min(ind, len(self._values) - 1)]


class StepWithFixedGammaParamScheduler(ParamScheduler):
    def __init__(self, base_value, num_decays, gamma, num_updates) -> None:
        values = [base_value * (gamma ** i) for i in range(num_decays + 1)]
        self._inner = StepParamScheduler(num_updates, values)

    def __call__(self, where: float) -> float:
        return self._inner(where)


class PolynomialDecayParamScheduler(ParamScheduler):
    def __init__(self, base_value: float, power: float) -> None:
        self._base_value = base_value
        self._power = power

    def __call__(self, where: float) -> float:
        return self._base_value * (1 - where) ** self._power
