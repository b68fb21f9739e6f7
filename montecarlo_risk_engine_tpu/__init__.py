"""montecarlo_risk_engine_tpu — TPU-native Monte Carlo pricing / xVA engine.

A from-scratch JAX/XLA re-design of konstantineder/montecarlo-risk-engine
(reference mounted at /root/reference): derivative pricing, counterparty
exposure profiles (CE/EPE/ENE/PFE/EEPE), CVA on collateralized netting sets,
and first/second-order sensitivities via jax autodiff — all compiled into a
single device program with paths sharded across a TPU mesh.
"""

from montecarlo_risk_engine_tpu.config import enable_compilation_cache, SimulationScheme, set_real_dtype
from montecarlo_risk_engine_tpu.api.controller import SimulationController
from montecarlo_risk_engine_tpu.api.results import SimulationResults
from montecarlo_risk_engine_tpu.metrics.metrics import (
    CEMetric,
    CVAMetric,
    EEPEMetric,
    ENEMetric,
    EPEMetric,
    Metric,
    MetricType,
    PFEMetric,
    PVMetric,
    RiskMetrics,
)
from montecarlo_risk_engine_tpu.models.black_scholes import BlackScholesModel
from montecarlo_risk_engine_tpu.models.black_scholes_multi import BlackScholesMulti
from montecarlo_risk_engine_tpu.models.cirpp import CIRPPModel
from montecarlo_risk_engine_tpu.models.heston import HestonModel
from montecarlo_risk_engine_tpu.models.hull_white import HullWhiteModel
from montecarlo_risk_engine_tpu.models.hybrid import ModelConfig
from montecarlo_risk_engine_tpu.models.schwartz_two_factor import SchwartzTwoFactorModel
from montecarlo_risk_engine_tpu.models.vasicek import VasicekModel
from montecarlo_risk_engine_tpu.products.asian_option import AsianAveragingType, AsianOption
from montecarlo_risk_engine_tpu.products.barrier_option import BarrierOption, BarrierOptionType
from montecarlo_risk_engine_tpu.products.base import OptionType, Product, ProductFamily, SettlementType
from montecarlo_risk_engine_tpu.products.basket_option import BasketOption, BasketOptionType
from montecarlo_risk_engine_tpu.products.bermudan_option import AmericanOption, BermudanOption
from montecarlo_risk_engine_tpu.products.binary_option import BinaryOption
from montecarlo_risk_engine_tpu.products.bond import Bond
from montecarlo_risk_engine_tpu.products.equity import Equity
from montecarlo_risk_engine_tpu.products.european_option import EuropeanOption
from montecarlo_risk_engine_tpu.products.flexicall import FlexiCall
from montecarlo_risk_engine_tpu.products.netting_set import NettingSet
from montecarlo_risk_engine_tpu.products.storage import Storage, StorageAction
from montecarlo_risk_engine_tpu.products.storage_config import StorageConfig
from montecarlo_risk_engine_tpu.products.swap import InterestRateSwap, IRSType
from montecarlo_risk_engine_tpu.utils.regression import PolynomialRegression, PolyomialRegression

__all__ = [name for name in dir() if not name.startswith("_")]
