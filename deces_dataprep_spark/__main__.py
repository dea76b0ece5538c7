from deces_dataprep_spark.cli import main

raise SystemExit(main())
