import datetime as dt

from fbs_data_pipelines_spark.plans.creditos import modeled_creditos, raw_creditos
from fbs_data_pipelines_spark.plans.radicados import modeled_radicados, raw_radicados


def _creditos_fixture(spark):
    cols = [
        "Crédito", "TasaInterés", "FechaIngreso", "FechaSolicitud",
        "Fecha Acta Aprobación", "FechaGiro", "FechaInicio",
        "FechaLegalización", "VencimientoCuota", "Monto", "Monto Aprobado",
        "Saldo", "FormaPago_duplicated_0",
    ]
    rows = [
        # clean row: giro present
        ("1", " 950847 %", "01/01/2020", "05/01/2020", "10/01/2020",
         "20/01/2020", "15/01/2020", "25/01/2020", "01/02/2020",
         "20648000,50", "1000,25", "999", "dup"),
        # dirty row: dotted/dashed dates, no giro (waits), junk interest
        ("2", "bad%", "02-01-2020", "06.01.2020", "", None, "16/01/2020 08:00",
         "junk", "29/02/2020", "x", "", "3,5", "dup"),
    ]
    return spark.createDataFrame(rows, cols)


def test_raw_creditos_end_to_end(spark):
    run_date = dt.date(2020, 3, 1)
    out = raw_creditos(_creditos_fixture(spark), run_date=run_date).collect()
    r1, r2 = out[0], out[1]

    # duplicated column dropped
    assert "FormaPago_duplicated_0" not in out[0].asDict()

    # interest /1e7 (preserve executed semantics, not the comment)
    assert abs(r1["TasaInterés"] - 0.0950847) < 1e-12
    assert r2["TasaInterés"] is None

    # derived day diffs
    assert r1["tiempo_solicitud_giro"] == 15
    assert r1["tiempo_solicitud_inicio"] == 10
    assert r1["tiempo_solicitud_legalizacion"] == 20
    assert r1["tiempo_de_espera"] is None  # giro present

    # waiting row: run_date - FechaSolicitud (06.01.2020 → 2020-01-06)
    assert r2["tiempo_de_espera"] == (run_date - dt.date(2020, 1, 6)).days
    assert r2["tiempo_solicitud_giro"] is None

    # money decimal comma
    assert r1["Monto"] == 20648000.5 and r1["Monto Aprobado"] == 1000.25
    assert r2["Monto"] is None

    # export normalization: dates are ISO strings
    assert r1["FechaSolicitud"] == "2020-01-05"
    assert r1["fecha_actual"] == "2020-03-01"
    # dirty variants parsed then formatted
    assert r2["FechaIngreso"] == "2020-01-02"
    assert r2["FechaInicio"] == "2020-01-16"  # time part stripped
    assert r2["FechaLegalización"] is None  # junk → null


def test_raw_creditos_typed_mode(spark):
    out = raw_creditos(_creditos_fixture(spark), run_date=dt.date(2020, 3, 1),
                       for_export=False)
    types = dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)
    assert types["FechaSolicitud"] == "date"
    assert types["Monto"] == "double"
    assert types["tiempo_de_espera"] == "bigint"


def test_modeled_creditos_empty_to_null(spark):
    df = spark.createDataFrame([("", "a")], ["x", "y"])
    r = modeled_creditos(df).collect()[0]
    assert r["x"] is None and r["y"] == "a"


def test_raw_radicados(spark):
    df = spark.createDataFrame(
        [
            ("100", "15/06/2023 14:30", "Jefe-GTICS-Ana", "1"),
            ("101", "junk", "Maria Lopez", "0"),
            ("102", "01/01/2024 09:05", "Sub-XXX-Bob", "1"),
        ],
        ["Radicado", "Fecha Radicacion", "Destino", "Rpta"],
    )
    out = raw_radicados(df).collect()
    r0, r1, r2 = out

    assert r0["Fecha Radicacion"] == dt.datetime(2023, 6, 15, 14, 30)
    assert r1["Fecha Radicacion"] is None

    assert (r0["cargo_destino"], r0["cod_grupo_destino"], r0["funcionario_destino"]) == (
        "Jefe", "GTICS", "Ana",
    )
    assert r0["grupo_destino"] == "Grupo de tecnología, informacion y comunicaciones"

    # bare name → defaults
    assert (r1["cargo_destino"], r1["cod_grupo_destino"], r1["funcionario_destino"]) == (
        None, "GAUEGI", None,
    )
    assert r1["grupo_destino"] == "Grupo de atencion al usuario"

    # unknown code → null group
    assert r2["cod_grupo_destino"] == "XXX" and r2["grupo_destino"] is None


def test_modeled_radicados_casts(spark):
    df = spark.createDataFrame([("100", "1"), ("junk", "x")], ["Radicado", "Rpta"])
    out = modeled_radicados(df).collect()
    assert out[0]["Radicado"] == 100 and out[0]["Rpta"] == 1
    assert out[1]["Radicado"] is None and out[1]["Rpta"] is None


def test_etl_pipeline_end_to_end(spark, tmp_path):
    """EP1 orchestration: layered dir store → registry dispatch →
    parquet load, driving the real creditos plan over a dirty CSV."""
    import datetime as dt
    import os

    from fbs_data_pipelines_spark.pipeline import ETLPipeline

    raw_dir = tmp_path / "raw"
    os.makedirs(raw_dir)
    creditos_csv = (
        "JUNK;JUNK;JUNK\n"
        "Crédito;TasaInterés;FechaIngreso;FechaSolicitud;"
        "Fecha Acta Aprobación;FechaGiro;FechaInicio;FechaLegalización;"
        "VencimientoCuota;Monto;Monto Aprobado;Saldo\n"
        '1;"950847 %";01/03/2020;15/03/2020;16/03/2020;20.03.2020;'
        '17/03/2020;18/03/2020;01/04/2020;"20648000,50";"1,99";"5,5"\n'
        '2;;02/03/2020;16-03-2020;;;;;;"1,99";;\n'
    )
    (raw_dir / "20240201_creditos.csv").write_bytes(creditos_csv.encode("latin-1"))
    radicados_csv = (
        "Radicado;Fecha Radicacion;Destino;Rpta\n"
        "100;15/03/2020 10:30;jefe-GTICS-maria;1\n"
        "101;16/03/2020 09:00;Pedro Perez;0\n"
    )
    (raw_dir / "20240201_radicados.csv").write_bytes(radicados_csv.encode("latin-1"))

    pipe = ETLPipeline(spark, str(tmp_path), run_date=dt.date(2020, 4, 1))
    results = pipe.run(layers=("raw",), out_dir=str(tmp_path / "out"))
    assert set(results) == {("raw", "creditos"), ("raw", "radicados")}

    cred = {
        r["Crédito"]: r
        for r in spark.read.parquet(str(tmp_path / "out/raw_creditos")).collect()
    }
    assert cred["1"]["TasaInterés"] == 0.0950847  # % strip + /1e7
    assert cred["1"]["Monto"] == 20648000.5  # comma decimal
    assert cred["1"]["FechaSolicitud"] == "2020-03-15"  # dotted/dashed → ISO
    assert cred["2"]["tiempo_de_espera"] == 16  # FechaGiro null → wait days

    rad = {
        r["Radicado"]: r
        for r in spark.read.parquet(str(tmp_path / "out/raw_radicados")).collect()
    }
    assert rad["100"]["cod_grupo_destino"] == "GTICS"
    assert rad["101"]["cod_grupo_destino"] == "GAUEGI"  # bare-name default


def test_ep2_audit_and_merge_flow(spark):
    """EP2 capstone: raw + modeled snapshots through the registry-driven
    audit log and snapshot merge (the reference's dormant wiring,
    connected end to end)."""
    import datetime as dt

    from fbs_data_pipelines_spark.operators.audit import merge_snapshot
    from fbs_data_pipelines_spark.pipeline import ETLPipeline, audit_and_merge
    from fbs_data_pipelines_spark.schema.registry import ColumnSpec, DataDictionary

    dictionary = DataDictionary(
        "creditos",
        [
            ColumnSpec("Credito", "String", hierarchy="PK"),
            ColumnSpec("Monto", "Float"),
            ColumnSpec("EstadoCredito", "String", audit=True),
        ],
    )
    pipe = ETLPipeline(spark, root="/nonexistent", run_date=dt.date(2020, 3, 1))
    pipe.output[("raw", "creditos")] = spark.createDataFrame(
        [("C1", "10", "Activo"), ("C2", "20", "Terminado"), ("C3", "30", "Activo")],
        "Credito string, Monto string, EstadoCredito string",
    )
    pipe.output[("modeled", "creditos")] = spark.createDataFrame(
        [("C1", "10", "Solicitud"), ("C2", "20", "Terminado")],
        "Credito string, Monto string, EstadoCredito string",
    )
    log_df, merged = audit_and_merge(
        pipe, "creditos", dictionary, run_id="R", run_ts=dt.datetime(2024, 1, 1)
    )
    log = log_df.collect()
    # only C1's audit-flagged column changed (C3 is new → inner join drops)
    assert len(log) == 1 and log[0]["Credito"] == "C1"
    assert log[0]["EstadoCredito_antiguo"] == "Solicitud"
    assert log[0]["EstadoCredito_nuevo"] == "Activo"

    m = {r["Credito"]: r["EstadoCredito"] for r in merged.collect()}
    # merge: C2 unchanged (kept), C1 changed + C3 new (from raw)
    assert m == {"C1": "Activo", "C2": "Terminado", "C3": "Activo"}
