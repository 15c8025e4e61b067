"""Synthetic workbook fixtures matching FIXTURES.md §1-2 shapes
(reference corpus schemas; real reference data stays out — personal
financial data). Deterministic rows chosen to exercise each pipeline
rule: lag-1 fill, CANCELED filter, empty names, dedup, truthy price
defaults, brand/category both-or-none, URL derivation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

COMPRAS_SCHEMA = (
    "`Descripción` string, `Cant` long, `Precio` double, `% Desc` double, "
    "`C. Unit US` double, `C. Unit` double, `Total Cmpr` double, `Envio` double, "
    "`purchase_date` date, `Fch Entrga` string, `Dólar` double, `Desct` double, "
    "`Pzs` long, `Costo Final` double, `Liga` string, `Picture_URL` string, "
    "`src_file` string, `row_idx` long"
)

PRECIOS_SCHEMA = (
    "`No` long, `Descripción` string, `Marca` string, `Categoria` string, "
    "`P. Tienda` double, `C. Unit` double, `Pzs` long, `Preview_URL` string, "
    "`P. Venta` double, `P. Oferta` double, `row_idx` long"
)

AMZ = "https://www.amazon.com.mx/dp/B0TOY1/ref=sr_1?qid=1"
ML = "https://articulo.mercadolibre.com.mx/MLM-123-toy?x=1"
TEMU = "https://www.temu.com/mx/some-toy-g-601.html?top=1"


def compras_row(
    desc="Toy A",
    cant=2,
    precio=200.0,
    c_unit=100.0,
    liga=AMZ,
    fch_entrga=None,
    costo_final=110.0,
    src_file="f1.xlsx",
    row_idx=0,
    c_unit_us=None,
    envio=20.0,
    desct=None,
    dolar=18.5,
    pzs=1,
    pct_desc=0.5,
):
    from datetime import date

    return (
        desc, cant, precio, pct_desc, c_unit_us, c_unit,
        (cant or 0) * (c_unit or 0.0), envio, date(2024, 3, 18), fch_entrga,
        dolar, desct, pzs, costo_final, liga, f"https://img/{desc}.jpg",
        src_file, row_idx,
    )


def precios_row(
    no=1, desc="Toy A", marca="LEGO", categoria="Peluche",
    p_tienda=250.0, c_unit=100.0, pzs=1, p_venta=180.0, p_oferta=150.0, row_idx=0,
):
    return (
        no, desc, marca, categoria, p_tienda, c_unit, pzs,
        f"https://img/{desc}.jpg", p_venta, p_oferta, row_idx,
    )


def make_compras(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, COMPRAS_SCHEMA)


def make_precios(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, PRECIOS_SCHEMA)
