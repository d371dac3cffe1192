from storm_data_etl_spark.cli import main

raise SystemExit(main())
